#!/bin/bash
# Canonical 8-drone mix baseline (reference equivalent: train.sh +
# runs/quad_multi_mix_baseline.py).  The reference's 36 workers x 4 envs
# become a single on-device batch of 1024 envs.
python -m quadswarm_tpu.training.train \
  --train_for_env_steps=1000000000 --num_envs=1024 \
  --learning_rate=0.0001 --ppo_clip_value=5.0 --nonlinearity=tanh \
  --gae_lambda=1.00 --max_grad_norm=5.0 --exploration_loss_coeff=0.0 \
  --rollout=128 --batch_size=1024 --reward_clip=10 --rnn_size=256 \
  --anneal_collision_steps=300000000 --replay_buffer_sample_prob=0.75 \
  --quads_num_agents=8 --quads_mode=mix --quads_episode_duration=15.0 \
  --quads_obs_repr=xyz_vxyz_R_omega \
  --quads_neighbor_hidden_size=256 --quads_neighbor_obs_type=pos_vel \
  --quads_collision_hitbox_radius=2.0 --quads_collision_falloff_radius=4.0 \
  --quads_collision_reward=5.0 --quads_collision_smooth_max_penalty=10.0 \
  --quads_neighbor_encoder_type=attention --quads_neighbor_visible_num=6 \
  --quads_use_obstacles=False --quads_use_downwash=True \
  --experiment=quad_mix_baseline "$@"
