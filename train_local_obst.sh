#!/bin/bash
# Obstacle-avoidance run (reference equivalent: train_local_obst.sh).
python -m quadswarm_tpu.training.train \
  --train_for_env_steps=1000000000 --num_envs=1024 \
  --learning_rate=0.0001 --ppo_clip_value=5.0 --nonlinearity=tanh \
  --gae_lambda=1.00 --max_grad_norm=5.0 --exploration_loss_coeff=0.0 \
  --rollout=128 --batch_size=1024 --reward_clip=10 --rnn_size=256 \
  --anneal_collision_steps=300000000 --replay_buffer_sample_prob=0.75 \
  --quads_num_agents=8 --quads_mode=mix --quads_episode_duration=15.0 \
  --quads_obs_repr=xyz_vxyz_R_omega_floor \
  --quads_neighbor_hidden_size=256 --quads_neighbor_obs_type=pos_vel \
  --quads_collision_hitbox_radius=2.0 --quads_collision_falloff_radius=4.0 \
  --quads_collision_reward=5.0 --quads_collision_smooth_max_penalty=4.0 \
  --quads_neighbor_encoder_type=no_encoder --quads_neighbor_visible_num=2 \
  --quads_use_obstacles=True --quads_obst_spawn_area 8 8 \
  --quads_obst_density=0.2 --quads_obst_size=0.6 \
  --quads_obst_collision_reward=5.0 --quads_obstacle_obs_type=octomap \
  --quads_use_downwash=True \
  --experiment=quad_obst_avoid "$@"
