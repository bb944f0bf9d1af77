"""End-to-end training smoke tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.multi import EnvConfig
from quadswarm_tpu.env.params import DynamicsParams, crazyflie_params
from quadswarm_tpu.models.actor_critic import ActorCritic
from quadswarm_tpu.parallel.mesh import make_mesh
from quadswarm_tpu.parallel.ppo import PPOConfig, Trainer


def _small_setup(num_envs=8, num_agents=2, **env_kwargs):
    env_cfg = EnvConfig(num_agents=num_agents, ep_time=2.0,
                        neighbor_obs_type="pos_vel", neighbor_visible_num=1,
                        quads_mode="static_same_goal", dtype=jnp.float32,
                        **env_kwargs)
    ppo_cfg = PPOConfig(rollout=8, batch_size=32, num_envs=num_envs)
    dyn = DynamicsParams.from_model(crazyflie_params(), dt=env_cfg.dt).astype(np.float32)
    model = ActorCritic(
        self_obs_dim=18, neighbor_obs_dim=6,
        num_neighbors=env_cfg.num_use_neighbor_obs,
        encoder_type="corl", neighbor_encoder_type="attention", rnn_size=32,
        neighbor_hidden=32)
    return env_cfg, ppo_cfg, model, dyn


def test_trainer_iterations_multi_device():
    assert len(jax.devices()) == 8, jax.devices()
    env_cfg, ppo_cfg, model, dyn = _small_setup()
    trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=0)
    m1, _ = trainer.iteration()
    m2, _ = trainer.iteration()
    assert np.isfinite(float(m1["loss"]))
    assert np.isfinite(float(m2["loss"]))
    assert trainer.env_steps == 2 * 8 * 8 * 2


def test_learning_reduces_value_loss():
    """A few iterations of PPO on the hover task must not diverge and the
    policy params must actually change."""
    env_cfg, ppo_cfg, model, dyn = _small_setup(num_envs=8)
    trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=1)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(),
                      jax.device_get(trainer.train_state.params))
    losses = []
    for _ in range(5):
        m, _ = trainer.iteration()
        losses.append(float(m["loss"]))
    p1 = jax.device_get(trainer.train_state.params)
    assert all(np.isfinite(losses))
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))), p0, p1)
    assert max(jax.tree.leaves(diffs)) > 0.0


def test_encoder_variants_forward():
    from quadswarm_tpu.models.encoders import make_encoder
    obs_dim = 18 + 6 * 6 + 9
    obs = jnp.ones((4, obs_dim))
    key = jax.random.PRNGKey(0)
    for etype, netype in [("corl", "attention"), ("corl", "mean_embed"),
                          ("corl", "mlp"), ("corl", "no_encoder"),
                          ("attention", "attention")]:
        enc = make_encoder(etype, self_obs_dim=18, neighbor_obs_dim=6,
                           num_neighbors=6, neighbor_encoder_type=netype,
                           use_obstacles=True, rnn_size=64,
                           neighbor_hidden=64, obstacle_hidden=64)
        params = enc.init(key, obs)
        out = enc.apply(params, obs)
        assert out.shape == (4, 128)
        assert jnp.all(jnp.isfinite(out))
    # sim2real single-head variant has rnn_size output
    enc = make_encoder("attention", self_obs_dim=18, neighbor_obs_dim=6,
                       num_neighbors=6, rnn_size=64, sim2real=True)
    params = enc.init(key, obs)
    assert enc.apply(params, obs).shape == (4, 64)


def test_gae_matches_naive():
    from quadswarm_tpu.parallel.ppo import Transition, compute_gae
    rng = np.random.default_rng(0)
    t_steps, e, n = 6, 2, 1
    rewards = rng.normal(size=(t_steps, e, n)).astype(np.float32)
    values = rng.normal(size=(t_steps, e, n)).astype(np.float32)
    dones = rng.random((t_steps, e, n)) < 0.2
    last_value = rng.normal(size=(e, n)).astype(np.float32)
    traj = Transition(
        obs=jnp.zeros((t_steps, e, n, 3)), actions=jnp.zeros((t_steps, e, n, 4)),
        log_prob=jnp.zeros((t_steps, e, n)), value=jnp.asarray(values),
        reward=jnp.asarray(rewards), done=jnp.asarray(dones))
    gamma, lam = 0.99, 0.95
    adv, ret = compute_gae(traj, jnp.asarray(last_value), gamma, lam)
    # naive backward pass
    expected = np.zeros_like(rewards)
    gae = np.zeros((e, n), np.float32)
    next_v = last_value
    for t in reversed(range(t_steps)):
        nd = 1.0 - dones[t].astype(np.float32)
        delta = rewards[t] + gamma * next_v * nd - values[t]
        gae = delta + gamma * lam * nd * gae
        expected[t] = gae
        next_v = values[t]
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected + values, rtol=1e-5)


def test_trainer_with_replay_buffer():
    env_cfg, ppo_cfg, model, dyn = _small_setup(num_envs=8)
    from quadswarm_tpu.parallel.ppo import PPOConfig
    ppo_cfg = PPOConfig(rollout=8, batch_size=32, num_envs=8,
                        replay_sample_prob=0.75)
    trainer = Trainer(env_cfg, ppo_cfg, model, dyn, seed=2)
    m, _ = trainer.iteration()
    assert np.isfinite(float(m["loss"]))
    assert trainer.replay_states is not None


def test_vtrace_reduces_to_gae_on_policy():
    """With ratio==1 and rho=c=1, V-trace targets equal GAE(lambda=1)
    returns (IMPALA paper, remark 1)."""
    from quadswarm_tpu.parallel.appo import vtrace_advantages
    from quadswarm_tpu.parallel.ppo import Transition, compute_gae
    rng = np.random.default_rng(3)
    t_steps, e, n = 7, 3, 2
    rewards = rng.normal(size=(t_steps, e, n)).astype(np.float32)
    values = rng.normal(size=(t_steps, e, n)).astype(np.float32)
    dones = rng.random((t_steps, e, n)) < 0.25
    last_value = rng.normal(size=(e, n)).astype(np.float32)
    traj = Transition(
        obs=jnp.zeros((t_steps, e, n, 3)), actions=jnp.zeros((t_steps, e, n, 4)),
        log_prob=jnp.zeros((t_steps, e, n)), value=jnp.asarray(values),
        reward=jnp.asarray(rewards), done=jnp.asarray(dones))
    gamma = 0.99
    gae_adv, gae_ret = compute_gae(traj, jnp.asarray(last_value), gamma, 1.0)
    ratio = jnp.ones((t_steps, e, n), jnp.float32)
    vt_adv, vs = vtrace_advantages(ratio, traj.reward, traj.value, traj.done,
                                   jnp.asarray(last_value), gamma)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(gae_ret),
                               rtol=1e-5, atol=1e-5)
    # on-policy pg advantage = one-step TD against vs_{t+1}; equals GAE(1)
    # advantage only when c-truncation is inactive, so just check vs here and
    # that the pg advantage matches its definition.
    vs_next = np.concatenate([np.asarray(vs)[1:], last_value[None]], axis=0)
    nd = 1.0 - dones.astype(np.float32)
    expect_adv = rewards + gamma * vs_next * nd - values
    np.testing.assert_allclose(np.asarray(vt_adv), expect_adv,
                               rtol=1e-5, atol=1e-5)


def test_appo_trainer_policy_lag_and_vtrace():
    """APPO with policy_lag=1 + V-trace trains without diverging; the
    behavior queue really lags the learner by one update."""
    from quadswarm_tpu.parallel.appo import APPOTrainer
    env_cfg, ppo_cfg, model, dyn = _small_setup()
    ppo_cfg = ppo_cfg.replace(with_vtrace=True)
    trainer = APPOTrainer(env_cfg, ppo_cfg, model, dyn, seed=2, policy_lag=1)
    m1, _ = trainer.iteration()
    # after one iteration: queue[0] (next behavior) is the INITIAL params,
    # not the just-updated ones
    updated = jax.device_get(trainer.train_state.params)
    behavior = jax.device_get(trainer._param_queue[0])
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))),
                         updated, behavior)
    assert max(jax.tree.leaves(diffs)) > 0.0, "behavior must lag learner"
    losses = [float(m1["loss"])]
    for _ in range(3):
        m, infos = trainer.iteration()
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert trainer.env_steps == 4 * 8 * 8 * 2


def test_appo_lag0_without_vtrace_runs():
    from quadswarm_tpu.parallel.appo import APPOTrainer
    env_cfg, ppo_cfg, model, dyn = _small_setup(num_envs=4)
    trainer = APPOTrainer(env_cfg, ppo_cfg, model, dyn, seed=4, policy_lag=0)
    m, _ = trainer.iteration()
    assert np.isfinite(float(m["loss"]))


def test_shuffled_minibatches_layout():
    """Minibatch layout: exact partition of the buffer, and every minibatch
    spans all rollout timesteps (reference shuffles per-sample; the chunked
    TPU layout must not collapse a minibatch onto one timestep)."""
    from quadswarm_tpu.parallel.ppo import shuffled_minibatches

    t_dim, e_dim, n_dim = 16, 64, 4
    total = t_dim * e_dim * n_dim
    idx = jnp.arange(total).reshape(t_dim, e_dim, n_dim)
    batch_size = 512
    dims = (t_dim, e_dim, n_dim)
    mb = shuffled_minibatches((idx,), dims, batch_size,
                              jax.random.PRNGKey(0), groups=32)[0]
    assert mb.shape == (total // batch_size, batch_size)
    # exact partition: every sample appears exactly once
    assert np.array_equal(np.sort(np.asarray(mb).ravel()), np.arange(total))
    # decorrelation: each minibatch covers every timestep and many envs
    tsteps = np.asarray(mb) // (e_dim * n_dim)
    envs = (np.asarray(mb) // n_dim) % e_dim
    for row_t, row_e in zip(tsteps, envs):
        assert len(np.unique(row_t)) == t_dim, "minibatch must span all timesteps"
        assert len(np.unique(row_e)) >= e_dim // 4, "minibatch must span many envs"
    # shard-awareness: every minibatch draws the SAME number of rows from
    # each contiguous env group (group = device shard under data sharding)
    groups = 32
    g_of_row = envs // (e_dim // np.gcd(np.gcd(e_dim, batch_size), groups))
    for row_g in g_of_row:
        _, counts = np.unique(row_g, return_counts=True)
        assert len(set(counts)) == 1, "groups must contribute equally"
    # different keys give different layouts
    mb2 = shuffled_minibatches((idx,), dims, batch_size,
                               jax.random.PRNGKey(1), groups=32)[0]
    assert not np.array_equal(np.asarray(mb), np.asarray(mb2))
    # single-device default (groups=1): still an exact partition spanning
    # all timesteps, via one coarse gather
    mb1 = shuffled_minibatches((idx,), dims, batch_size,
                               jax.random.PRNGKey(0), groups=1)[0]
    assert np.array_equal(np.sort(np.asarray(mb1).ravel()), np.arange(total))
    t1 = np.asarray(mb1) // (e_dim * n_dim)
    for row_t in t1:
        assert len(np.unique(row_t)) == t_dim


def test_shuffled_minibatches_series_diversity():
    """Round-5 regression: at baseline-like power-of-2 shapes the old
    stride-num_chunks slicing left only TWO distinct (env, agent) series
    per chunk — 8 per minibatch — which starves sample diversity and makes
    mixed-PBT per-policy masks empty in ~(7/8)^8 of minibatches.  The
    two-axis tile layout must give every minibatch many distinct series
    AND many distinct timesteps."""
    from quadswarm_tpu.parallel.ppo import shuffled_minibatches

    t_dim, e_dim, n_dim, batch = 128, 64, 8, 1024
    total = t_dim * e_dim * n_dim
    idx = jnp.arange(total).reshape(t_dim, e_dim, n_dim)
    mb = np.asarray(shuffled_minibatches(
        (idx,), (t_dim, e_dim, n_dim), batch, jax.random.PRNGKey(3),
        groups=1)[0])
    assert np.array_equal(np.sort(mb.ravel()), np.arange(total))
    series = mb % (e_dim * n_dim)
    tsteps = mb // (e_dim * n_dim)
    for i in range(mb.shape[0]):
        assert len(np.unique(series[i])) >= 32, \
            f"minibatch {i}: series diversity collapsed"
        assert len(np.unique(tsteps[i])) >= 16, \
            f"minibatch {i}: timestep diversity collapsed"
