"""Input/return normalization (SF --normalize_input / --normalize_returns;
reference baselines set both False — quad_multi_mix_baseline.py:17-18).

The running mean-std is validated against a NumPy full-batch oracle; the
trainer integration asserts the stats actually track the rollout data, that
defaults leave the path disabled, and that the state checkpoints/resumes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from quadswarm_tpu.env.multi import EnvConfig
from quadswarm_tpu.env.params import make_dynamics_params
from quadswarm_tpu.models.actor_critic import ActorCritic
from quadswarm_tpu.parallel.normalize import (
    NormalizerState, RunningMeanStd, make_norm_state,
)
from quadswarm_tpu.parallel.ppo import PPOConfig, Trainer


def test_running_mean_std_matches_full_batch_oracle():
    rng = np.random.default_rng(0)
    chunks = [rng.normal(3.0, 2.0, (50, 4)).astype(np.float32)
              for _ in range(5)]
    rms = RunningMeanStd.create(4)
    for c in chunks:
        rms = rms.update(jnp.asarray(c))
    full = np.concatenate(chunks, axis=0)
    np.testing.assert_allclose(np.asarray(rms.mean), full.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rms.var), full.var(0), rtol=1e-3)
    # scalar variant (returns) + leading-axes reduction
    rms_s = RunningMeanStd.create().update(jnp.asarray(full.reshape(5, 50, 4)))
    np.testing.assert_allclose(float(rms_s.mean), full.mean(), rtol=1e-4)


def test_update_masked_equals_update_on_selected_rows():
    """update_masked(x, w) == update(x[w == 1]) — the per-policy stats path
    of mixed PBT (each policy folds in only its agents' samples); and an
    all-zero mask leaves the stats untouched."""
    rng = np.random.default_rng(1)
    x = rng.normal(-1.0, 1.5, (64, 3)).astype(np.float32)
    w = (rng.random(64) < 0.4).astype(np.float32)
    a = RunningMeanStd.create(3).update(jnp.asarray(x[:8]))  # warm start
    masked = a.update_masked(jnp.asarray(x), jnp.asarray(w))
    dense = a.update(jnp.asarray(x[w.astype(bool)]))
    np.testing.assert_allclose(np.asarray(masked.mean), np.asarray(dense.mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(masked.var), np.asarray(dense.var),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(masked.count), float(dense.count))
    # zero mask: no-op
    z = a.update_masked(jnp.asarray(x), jnp.zeros(64))
    np.testing.assert_array_equal(np.asarray(z.mean), np.asarray(a.mean))
    np.testing.assert_array_equal(float(z.count), float(a.count))
    # scalar-stat variant (return normalizer)
    r = RunningMeanStd.create().update(jnp.asarray(x[:8, 0]))
    masked_r = r.update_masked(jnp.asarray(x[:, 0]), jnp.asarray(w))
    dense_r = r.update(jnp.asarray(x[w.astype(bool), 0]))
    np.testing.assert_allclose(float(masked_r.mean), float(dense_r.mean),
                               rtol=1e-5)
    np.testing.assert_allclose(float(masked_r.var), float(dense_r.var),
                               rtol=1e-4)


def test_normalize_denormalize_roundtrip_and_clip():
    rms = RunningMeanStd.create(3).update(
        jnp.asarray(np.random.default_rng(1).normal(5.0, 0.1, (100, 3))))
    x = jnp.asarray([[5.0, 5.1, 4.9]])
    y = rms.normalize(x, clip=None)
    np.testing.assert_allclose(np.asarray(rms.denormalize(y)),
                               np.asarray(x), rtol=1e-4)
    # clip bounds the standardized value
    far = rms.normalize(jnp.asarray([[100.0, 100.0, 100.0]]))
    assert np.all(np.asarray(far) <= 5.0)


def _trainer(**ppo_kwargs):
    env_cfg = EnvConfig(num_agents=2, ep_time=1.0, neighbor_visible_num=1,
                        neighbor_obs_type="pos_vel",
                        quads_mode="static_same_goal", dtype=jnp.float32)
    ppo_cfg = PPOConfig(rollout=4, batch_size=16, num_envs=4, **ppo_kwargs)
    model = ActorCritic(self_obs_dim=18, neighbor_obs_dim=6, num_neighbors=1,
                        encoder_type="corl", neighbor_encoder_type="attention",
                        rnn_size=16, neighbor_hidden=16)
    return Trainer(env_cfg, ppo_cfg, model, make_dynamics_params(), seed=0)


def test_trainer_default_has_normalization_disabled():
    tr = _trainer()
    assert tr.norm_state.obs is None and tr.norm_state.ret is None
    metrics, _ = tr.iteration()
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_trainer_normalization_tracks_rollout_stats():
    tr = _trainer(normalize_input=True, normalize_returns=True)
    assert tr.norm_state.obs is not None and tr.norm_state.ret is not None
    c0 = float(tr.norm_state.obs.count)
    for _ in range(2):
        metrics, _ = tr.iteration()
        assert np.isfinite(float(jax.device_get(metrics["loss"])))
    ns = jax.device_get(tr.norm_state)
    # two rollouts of 4*4*2 = 32 obs rows each folded in
    assert abs(float(ns.obs.count) - (c0 + 64.0)) < 1e-3
    assert np.all(np.isfinite(ns.obs.mean)) and np.all(ns.obs.var >= 0)
    # obs feature 0 is pos-goal delta; its running mean must be in room range
    assert np.abs(ns.obs.mean).max() < 20.0
    assert float(ns.ret.count) > 1.0 and np.isfinite(float(ns.ret.mean))


def test_norm_state_checkpoints_and_resumes(tmp_path):
    from quadswarm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tr = _trainer(normalize_input=True, normalize_returns=True)
    tr.iteration()
    save_checkpoint(str(tmp_path), tr.train_state, 123,
                    extra=tr.norm_state)
    tr2 = _trainer(normalize_input=True, normalize_returns=True)
    cp = str(next(tmp_path.glob("checkpoint_*.msgpack")))
    state, steps, norm = load_checkpoint(cp, tr2.train_state,
                                         extra=tr2.norm_state)
    assert steps == 123
    np.testing.assert_allclose(np.asarray(norm.obs.mean),
                               np.asarray(jax.device_get(tr.norm_state.obs.mean)))
    np.testing.assert_allclose(float(norm.ret.count),
                               float(jax.device_get(tr.norm_state.ret.count)))
    # disabled-normalization checkpoints roundtrip too (extra = empty state)
    tr3 = _trainer()
    save_checkpoint(str(tmp_path / "d"), tr3.train_state, 5,
                    extra=tr3.norm_state)
    cp3 = str(next((tmp_path / "d").glob("checkpoint_*.msgpack")))
    _, steps3, norm3 = load_checkpoint(cp3, tr3.train_state,
                                       extra=tr3.norm_state)
    assert steps3 == 5 and norm3.obs is None and norm3.ret is None


def test_cli_flags_wire_into_ppo_config():
    from quadswarm_tpu.training.config import (
        parse_swarm_cfg, ppo_config_from_args,
    )
    args = parse_swarm_cfg(["--normalize_input=True",
                            "--normalize_returns=True"])
    cfg = ppo_config_from_args(args)
    assert cfg.normalize_input and cfg.normalize_returns
    cfg0 = ppo_config_from_args(parse_swarm_cfg([]))
    assert not cfg0.normalize_input and not cfg0.normalize_returns
    assert make_norm_state(False, False, 24) == NormalizerState(None, None)
