"""Train-step smoke + multi-chip sharding tests (8 virtual CPU devices)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mhada_tpu.config import ImageTrainConfig, VideoTrainConfig, ModelConfig
from mhada_tpu.train.train_image import (
    create_train_state,
    make_image_train_step,
    build_models,
)
from mhada_tpu.train.train_video import make_video_train_step

TINY = ModelConfig(hidden_dim=64, mlp_dim=128, num_heads=4)


def test_image_train_step_decreases_loss():
    cfg = ImageTrainConfig(model=TINY, batch_size=2, image_size=(32, 32))
    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_image_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    state, m0 = step(state, vgg, c, s)
    for _ in range(3):
        state, m = step(state, vgg, c, s)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 4


def test_video_train_step_runs():
    cfg = VideoTrainConfig(
        model=TINY, batch_size=2, style_size=(32, 32), content_size=(32, 64)
    )
    from mhada_tpu.train.train_image import init_params, make_optimizer
    from mhada_tpu.train.train_image import TrainState

    icfg = ImageTrainConfig(model=TINY, image_size=(32, 32))
    params = init_params(jax.random.PRNGKey(0), icfg)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params["trainable"],
        opt_state=tx.init(params["trainable"]),
    )
    step = make_video_train_step(cfg, donate=False)
    rng = np.random.default_rng(1)
    style = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    c1 = jnp.asarray(rng.uniform(0, 255, (2, 32, 64, 3)), jnp.float32)
    c2 = jnp.asarray(rng.uniform(0, 255, (2, 32, 64, 3)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((2, 32, 64, 2)), jnp.float32)
    mask = jnp.asarray(
        (rng.uniform(size=(2, 32, 64)) > 0.2).astype(np.float32)
    )
    state, metrics = step(state, params["vgg19"], style, c1, c2, flow, mask)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) == 8, "conftest should give 8 cpu devices"
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # compile-check on tiny shapes instead of 512^2 (CPU test budget):
    # jit-lower and compile without executing the full-size graph.
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compile() is not None


def test_image_train_step_with_remat():
    cfg = ImageTrainConfig(
        model=TINY, batch_size=2, image_size=(32, 32), remat=True
    )
    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_image_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    state, m = step(state, vgg, c, s)
    assert np.isfinite(float(m["loss"]))

    # remat must not change gradients: compare one step vs no-remat
    cfg2 = ImageTrainConfig(model=TINY, batch_size=2, image_size=(32, 32))
    state2, vgg2 = create_train_state(jax.random.PRNGKey(0), cfg2)
    step2 = make_image_train_step(cfg2, donate=False)
    state2, m2 = step2(state2, vgg2, c, s)
    np.testing.assert_allclose(float(m["loss"]), float(m2["loss"]), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        # recompute-order rounding shifts Adam updates by O(1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_sharded_inference_8_devices():
    """Data-parallel batched inference: replicated params, batch sharded
    over the 8-device mesh; outputs must match single-device execution."""
    from mhada_tpu.parallel import make_mesh, shard_batch, replicate
    from mhada_tpu.infer.image import init_inference_params, make_stylize_fn

    models = build_models(TINY)
    params = init_inference_params(models, jax.random.PRNGKey(0))
    fn = make_stylize_fn(models)
    rng = np.random.default_rng(3)
    c = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)
    s = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)

    ref = fn(params, jnp.asarray(c), jnp.asarray(s))

    mesh = make_mesh()  # 8 devices on 'data'
    p_rep = replicate(mesh, params)
    cb, sb = shard_batch(mesh, (c, s))
    out = fn(p_rep, cb, sb)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_train_step_matches_single_device():
    """One image train step on a (4, 2) dp x tp mesh must reproduce the
    single-device step: same loss and same updated params (VERDICT item 7 —
    a wrong TP rule in parallel/mesh.py must not pass silently)."""
    from mhada_tpu.parallel import make_mesh, shard_batch, shard_params, replicate
    from mhada_tpu.train.train_image import make_optimizer, TrainState

    cfg = ImageTrainConfig(model=TINY, batch_size=4, image_size=(32, 32))
    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_image_train_step(cfg, donate=False)
    rng = np.random.default_rng(7)
    c = rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32)
    s = rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32)

    ref_state, ref_m = step(state, vgg, jnp.asarray(c), jnp.asarray(s))

    mesh = make_mesh(4, 2)
    params = shard_params(mesh, state.params)
    assert any(
        len(x.sharding.device_set) == 8 and
        x.sharding.spec != jax.sharding.PartitionSpec()
        for x in jax.tree_util.tree_leaves(params)
    ), "TP rules matched nothing — test would be vacuous"
    sh_state = TrainState(
        step=state.step, params=params,
        opt_state=make_optimizer(cfg).init(params),
    )
    vgg_sh = replicate(mesh, vgg)
    cb, sb = shard_batch(mesh, (c, s))
    new_state, m = step(sh_state, vgg_sh, cb, sb)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    tp_leaves = jax.tree_util.tree_leaves_with_path(new_state.params)
    for (pa, a), (pb, b) in zip(ref_leaves, tp_leaves):
        assert pa == pb
        # Adam's first step moves params by ~±lr (1e-4); where a gradient is
        # ~0, psum reduction-order rounding can flip the update sign -> 2e-4.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_video_dp_train_step_matches_single_device():
    """One VIDEO train step on a (4, 2) dp x tp mesh must reproduce the
    single-device step (VERDICT r4 #3): the warp gather and the masked
    nnz-normalised temporal means (reference lossfn.py:50-86,
    utilities.py:100-151) must be shard-invariant under a dp-sharded
    (style, c1, c2, flow, mask) batch."""
    from mhada_tpu.parallel import make_mesh, shard_batch, shard_params, replicate
    from mhada_tpu.train.train_image import init_params, make_optimizer
    from mhada_tpu.train.train_image import TrainState

    cfg = VideoTrainConfig(
        model=TINY, batch_size=4, style_size=(32, 32), content_size=(32, 64)
    )
    icfg = ImageTrainConfig(model=TINY, batch_size=4, image_size=(32, 32))
    params = init_params(jax.random.PRNGKey(0), icfg)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params["trainable"],
        opt_state=tx.init(params["trainable"]),
    )
    step = make_video_train_step(cfg, donate=False)
    rng = np.random.default_rng(11)
    style = rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32)
    c1 = rng.uniform(0, 255, (4, 32, 64, 3)).astype(np.float32)
    c2 = rng.uniform(0, 255, (4, 32, 64, 3)).astype(np.float32)
    flow = rng.standard_normal((4, 32, 64, 2)).astype(np.float32) * 2.0
    # adversarial mask: one sample fully occluded (empty-mask guard must be
    # identical under sharding), the rest sparse
    mask = (rng.uniform(size=(4, 32, 64)) > 0.5).astype(np.float32)
    mask[1] = 0.0

    ref_state, ref_m = step(
        state, params["vgg19"], *map(jnp.asarray, (style, c1, c2, flow, mask))
    )

    mesh = make_mesh(4, 2)
    sh_params = shard_params(mesh, state.params)
    assert any(
        len(x.sharding.device_set) == 8 and
        x.sharding.spec != jax.sharding.PartitionSpec()
        for x in jax.tree_util.tree_leaves(sh_params)
    ), "TP rules matched nothing — test would be vacuous"
    sh_state = TrainState(
        step=state.step, params=sh_params, opt_state=tx.init(sh_params),
    )
    vgg_sh = replicate(mesh, params["vgg19"])
    sb, c1b, c2b, fb, mb = shard_batch(mesh, (style, c1, c2, flow, mask))
    new_state, m = step(sh_state, vgg_sh, sb, c1b, c2b, fb, mb)

    for k in ref_m:
        # psum reduction order vs single-device accumulation: the deep
        # identity-loss chains (5 VGG scales) wander ~1e-4 rel; a real
        # shard-variance bug (e.g. per-shard nnz normalisation) is O(1)
        np.testing.assert_allclose(float(m[k]), float(ref_m[k]), rtol=5e-4,
                                   atol=1e-6, err_msg=k)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    dp_leaves = jax.tree_util.tree_leaves_with_path(new_state.params)
    for (pa, a), (pb, b) in zip(ref_leaves, dp_leaves):
        assert pa == pb
        # Adam's first step moves params by ~±lr (1e-4); where a gradient is
        # ~0, psum reduction-order rounding can flip the update sign -> 2e-4.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_loader_early_stop_no_hang():
    """Breaking out of a DataLoader iteration must not wedge the producer."""
    import time

    from mhada_tpu.data import DataLoader

    class SlowDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            time.sleep(0.01)
            return np.zeros((4, 4), np.float32)

    dl = DataLoader(SlowDS(), batch_size=4, num_workers=2, prefetch=2,
                    seed=0)
    it = iter(dl)
    next(it)
    del it  # consumer stops early; producer must wind down via stop event
    # a fresh epoch must still work
    n = sum(1 for _ in DataLoader(SlowDS(), batch_size=4, num_workers=2,
                                  seed=0))
    assert n == 16


def test_fused_sweeps_matches_unfused():
    """fused_sweeps batches the 4 ViT / 3 AdaFormer / 5 VGG sweeps on the
    batch axis — exact (to reassociation noise) vs the literal per-sweep
    graph under attn_mode="spatial", for loss AND grads."""
    from dataclasses import replace

    from mhada_tpu.train.train_image import image_loss_fn, init_params

    cfg_f = ImageTrainConfig(
        model=TINY, batch_size=2, image_size=(32, 32), fused_sweeps=True)
    cfg_u = replace(cfg_f, fused_sweeps=False)
    models = build_models(cfg_f, for_training=True)
    params = init_params(jax.random.PRNGKey(0), cfg_f, models)
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)

    def run(cfg):
        (loss, metrics), grads = jax.value_and_grad(
            image_loss_fn, has_aux=True
        )(params["trainable"], params["vgg19"], c, s, models, cfg)
        return loss, metrics, grads

    lf, mf, gf = run(cfg_f)
    lu, mu, gu = run(cfg_u)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    for k in mf:
        np.testing.assert_allclose(float(mf[k]), float(mu[k]), rtol=1e-4,
                                   atol=1e-6)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    flat_u, _ = jax.flatten_util.ravel_pytree(gu)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_u),
                               rtol=1e-3, atol=1e-5)


def test_fused_sweeps_resolution():
    """'auto' resolves to OFF (measured slower on v5e — see
    ImageTrainConfig.fused_sweeps); explicit True/False are honoured.
    The batch-coupled behavioural delta of forced batching is real but
    sub-ULP at loss scale, so the resolution logic is what's pinned."""
    from mhada_tpu.train.train_image import resolve_fused_sweeps

    tiny_bc = ModelConfig(hidden_dim=64, mlp_dim=128, num_heads=4,
                          attn_mode="batch_coupled")
    assert not resolve_fused_sweeps(
        ImageTrainConfig(model=tiny_bc, batch_size=2, image_size=(32, 32)))
    assert not resolve_fused_sweeps(
        ImageTrainConfig(model=TINY, batch_size=2, image_size=(32, 32)))
    assert resolve_fused_sweeps(ImageTrainConfig(
        model=TINY, batch_size=2, image_size=(32, 32), fused_sweeps=True))
    assert not resolve_fused_sweeps(ImageTrainConfig(
        model=TINY, batch_size=2, image_size=(32, 32), fused_sweeps=False))


def test_uint8_batch_matches_float32():
    """run_image ships batches as uint8 (lossless: decoded pixels are
    integral; quarter H2D bytes) — the step must produce identical
    metrics vs the same batch in float32."""
    cfg = ImageTrainConfig(model=TINY, batch_size=2, image_size=(32, 32))
    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_image_train_step(cfg, donate=False)
    rng = np.random.default_rng(5)
    c8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    s8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    _, m_u8 = step(state, vgg, jnp.asarray(c8), jnp.asarray(s8))
    _, m_f32 = step(state, vgg, jnp.asarray(c8, jnp.float32),
                    jnp.asarray(s8, jnp.float32))
    for k in m_u8:
        np.testing.assert_allclose(float(m_u8[k]), float(m_f32[k]),
                                   rtol=1e-6)


def test_video_uint8_images_match_float32():
    """run_video ships style/c1/c2 as uint8 (flow/mask stay float) — the
    step must produce identical metrics vs the float32 batch."""
    cfg = VideoTrainConfig(
        model=TINY, batch_size=2, style_size=(32, 32), content_size=(32, 64)
    )
    from mhada_tpu.train.train_image import init_params, make_optimizer
    from mhada_tpu.train.train_image import TrainState

    icfg = ImageTrainConfig(model=TINY, image_size=(32, 32))
    params = init_params(jax.random.PRNGKey(0), icfg)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params["trainable"],
        opt_state=tx.init(params["trainable"]),
    )
    step = make_video_train_step(cfg, donate=False)
    rng = np.random.default_rng(6)
    s8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    c18 = rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8)
    c28 = rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8)
    flow = jnp.asarray(rng.standard_normal((2, 32, 64, 2)), jnp.float32)
    mask = jnp.asarray(
        (rng.uniform(size=(2, 32, 64)) > 0.2).astype(np.float32))
    _, m_u8 = step(state, params["vgg19"], jnp.asarray(s8),
                   jnp.asarray(c18), jnp.asarray(c28), flow, mask)
    _, m_f32 = step(state, params["vgg19"],
                    jnp.asarray(s8, jnp.float32),
                    jnp.asarray(c18, jnp.float32),
                    jnp.asarray(c28, jnp.float32), flow, mask)
    for k in m_u8:
        np.testing.assert_allclose(float(m_u8[k]), float(m_f32[k]),
                                   rtol=1e-6)
