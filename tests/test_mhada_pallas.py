"""Fused Pallas MHAda kernel vs the naive einsum formulation (interpret mode
on CPU; the real-TPU path is exercised by bench.py and entry())."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mhada_tpu.ops.mhada import mhada_attention
from mhada_tpu.ops.mhada_pallas import mhada_attention_pallas

RNG = np.random.default_rng(0)


def _inputs(b, h, n, m, d, scale=1.0):
    # fresh generator per call: inputs don't depend on which tests ran
    # before (a shared stream made tolerances order-dependent)
    rng = np.random.default_rng((b, h, n, m, d))
    q = jnp.asarray(rng.standard_normal((b, h, n, d)) * scale, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, m, d)) * scale, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, m, d)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    return q, k, v, f


@pytest.mark.parametrize(
    "b,h,n,m,d",
    [
        (1, 2, 256, 256, 64),     # aligned
        (1, 1, 256, 300, 64),     # key padding (masked -inf path)
        (2, 2, 130, 128, 64),     # query padding
        (1, 1, 512, 128, 64),     # multi-block query grid
        (1, 8, 1024, 256, 64),    # many heads, 1024 queries (r1 lastfailed)
        (1, 1, 1024, 1024, 64),   # 1024-token square
    ],
)
def test_pallas_matches_naive(b, h, n, m, d):
    q, k, v, f = _inputs(b, h, n, m, d)
    ref = mhada_attention(q, k, v, f, "softmax")
    with pltpu.force_tpu_interpret_mode():
        got = mhada_attention_pallas(q, k, v, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "b,h,n,m,d",
    [
        (1, 2, 256, 1024, 64),    # multi-key-block streaming, aligned
        (1, 1, 256, 1200, 64),    # streaming + key padding in the last block
        (1, 1, 300, 1024, 64),    # streaming + query padding
    ],
)
def test_pallas_streaming_matches_naive(b, h, n, m, d):
    """Flash-style key streaming (online softmax + running A.V/A.V^2),
    forced on regardless of the auto threshold."""
    q, k, v, f = _inputs(b, h, n, m, d)
    ref = mhada_attention(q, k, v, f, "softmax")
    with pltpu.force_tpu_interpret_mode():
        got = mhada_attention_pallas(q, k, v, f, block_m=512, streaming=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_pallas_streaming_auto_threshold():
    """M > SINGLE_PASS_MAX_M auto-selects the streaming path (1024^2-scale
    keys shrunk via a tiny block_m would be slow in interpret mode, so the
    threshold itself is monkeypatched instead)."""
    import mhada_tpu.ops.mhada_pallas as mp

    q, k, v, f = _inputs(1, 1, 128, 640, 64)
    ref = mhada_attention(q, k, v, f, "softmax")
    old = mp.SINGLE_PASS_MAX_M
    try:
        mp.SINGLE_PASS_MAX_M = 512  # force auto-streaming at m=640
        with pltpu.force_tpu_interpret_mode():
            got = mhada_attention_pallas(q, k, v, f, block_m=256)
    finally:
        mp.SINGLE_PASS_MAX_M = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_pallas_large_logits_stable():
    # unscaled softmax can see large Q.K products; max-subtraction must hold
    q, k, v, f = _inputs(1, 1, 128, 128, 64, scale=10.0)
    ref = mhada_attention(q, k, v, f, "softmax")
    with pltpu.force_tpu_interpret_mode():
        got = mhada_attention_pallas(q, k, v, f)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)


def test_adaformer_pallas_matches_naive():
    from mhada_tpu.models import AdaFormer

    fc = [jnp.asarray(RNG.standard_normal((1, 8, 8, 64)), jnp.float32)
          for _ in range(3)]
    fs = [jnp.asarray(RNG.standard_normal((1, 6, 10, 64)), jnp.float32)
          for _ in range(3)]
    naive = AdaFormer(num_heads=4)
    fused = AdaFormer(num_heads=4, use_pallas=True)
    params = naive.init(jax.random.PRNGKey(0), fc, fs)["params"]
    ref_fcs, ref_cs = naive.apply({"params": params}, fc, fs)
    with pltpu.force_tpu_interpret_mode():
        got_fcs, got_cs = fused.apply({"params": params}, fc, fs)
    np.testing.assert_allclose(np.asarray(got_fcs), np.asarray(ref_fcs),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_cs), np.asarray(ref_cs),
                               atol=5e-4, rtol=1e-3)


def test_fused_prologue_matches_unfused():
    """AdaFormer with the IN+Q-projection fused into the kernel prologue
    (inference KV-cached path) matches the plain path on shared params."""
    from mhada_tpu.models import AdaFormer
    from mhada_tpu.infer.image import precompute_style_kv

    fc = [jnp.asarray(RNG.standard_normal((1, 8, 16, 128)), jnp.float32)
          for _ in range(3)]
    fs = [jnp.asarray(RNG.standard_normal((1, 8, 8, 128)), jnp.float32)
          for _ in range(3)]
    naive = AdaFormer(num_heads=2)
    fused = AdaFormer(num_heads=2, use_pallas=True, fuse_prologue=True)
    params = naive.init(jax.random.PRNGKey(1), fc, fs)["params"]
    ref_fcs, ref_cs = naive.apply({"params": params}, fc, fs)

    with pltpu.force_tpu_interpret_mode():
        kv = precompute_style_kv(
            {"adaFormer": fused}, {"adaFormer": params},
            [f for f in fs])
        got_fcs, got_cs = fused.apply({"params": params}, fc, None,
                                      style_kv=kv)
    np.testing.assert_allclose(np.asarray(got_fcs), np.asarray(ref_fcs),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_cs), np.asarray(ref_cs),
                               atol=5e-3, rtol=1e-2)


def test_vit_attention_tokmaj_matches_naive():
    """Token-major packed-qkv kernel (2 heads per 128-lane program) vs the
    naive einsum module, including an unaligned query count."""
    import math

    from mhada_tpu.ops.attention_pallas import attention_pallas_tm

    for n in (512, 576):
        rng = np.random.default_rng(n)
        c = 128
        qkv = jnp.asarray(rng.standard_normal((2, n, 3 * c)), jnp.float32)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(2, n, 2, 64).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(64)
        logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) * scale
        a = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bhkd->bhqd", a, heads(v))
        ref = ref.transpose(0, 2, 1, 3).reshape(2, n, c)
        with pltpu.force_tpu_interpret_mode():
            got = attention_pallas_tm(qkv, scale=scale, num_heads=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-3)


def test_vit_attention_tokmaj_module_matches_naive():
    from mhada_tpu.models.layers import MultiHeadSelfAttention

    x = jnp.asarray(RNG.standard_normal((1, 512, 128)), jnp.float32)
    naive = MultiHeadSelfAttention(num_heads=2)
    fused = MultiHeadSelfAttention(num_heads=2, use_pallas=True, tokmaj=True)
    params = naive.init(jax.random.PRNGKey(0), x)["params"]
    ref = naive.apply({"params": params}, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)


def test_vit_attention_pallas_matches_naive():
    from mhada_tpu.models.layers import MultiHeadSelfAttention

    x = jnp.asarray(RNG.standard_normal((1, 512, 128)), jnp.float32)
    naive = MultiHeadSelfAttention(num_heads=2)
    fused = MultiHeadSelfAttention(num_heads=2, use_pallas=True)
    params = naive.init(jax.random.PRNGKey(0), x)["params"]
    ref = naive.apply({"params": params}, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)


def test_pallas_vjp_matches_naive_grads():
    """Gradients through the fused kernel (custom VJP, XLA-rematerialised
    backward) must match autodiff of the naive formulation."""
    q, k, v, f = _inputs(1, 2, 128, 160, 64)

    def loss_naive(args):
        q, k, v, f = args
        out = mhada_attention(q, k, v, f, "softmax")
        return jnp.sum(jnp.sin(out))

    def loss_pallas(args):
        q, k, v, f = args
        out = mhada_attention_pallas(q, k, v, f)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(loss_naive)((q, k, v, f))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v, f))
    for a, b in zip(g_got, g_ref):
        # atol covers f32 rematerialised-softmax noise: the sqrt/clip chain
        # amplifies ulp-level logit differences near the clip boundary.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=1e-2)


def test_pallas_streaming_vjp_matches_naive_grads():
    """Gradients through the flash-style Pallas backward kernels with
    multiple key AND query blocks (padding in both axes)."""
    q, k, v, f = _inputs(1, 1, 300, 640, 64)

    def loss_naive(args):
        q, k, v, f = args
        return jnp.sum(jnp.sin(mhada_attention(q, k, v, f, "softmax")))

    def loss_pallas(args):
        q, k, v, f = args
        out = mhada_attention_pallas(q, k, v, f, block_n=128, block_m=256,
                                     streaming=True)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(loss_naive)((q, k, v, f))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v, f))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2)


def test_vit_attention_streaming_matches_naive():
    from mhada_tpu.ops.attention_pallas import attention_pallas

    q, k, v, _ = _inputs(1, 2, 256, 1200, 64)
    scale = 0.125
    ref = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
    )
    ref = jnp.einsum("bhnm,bhmd->bhnd", ref, v)
    with pltpu.force_tpu_interpret_mode():
        got = attention_pallas(q, k, v, scale, block_m=512, streaming=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "n,tn,tm,dtype",
    [
        (512, 128, 512, jnp.float32),    # single key block
        (640, 128, 256, jnp.float32),    # multi-block stream + masked tail
        (768, 256, 256, jnp.bfloat16),   # bf16, aligned
    ],
)
def test_vit_attention_stream_wide_matches_naive(n, tn, tm, dtype):
    """Wide transposed streaming kernel (two heads per program, O^T
    accumulation) vs the naive einsum on the packed qkv layout."""
    import math

    from mhada_tpu.ops.attention_pallas import attention_stream_wide

    rng = np.random.default_rng(n)
    c = 128  # 2 heads x 64
    qkv = jnp.asarray(rng.standard_normal((2, n, 3 * c)), dtype)
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)

    def heads(t):
        return t.reshape(2, n, 2, 64).transpose(0, 2, 1, 3)

    scale = 1.0 / math.sqrt(64)
    logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) * scale
    a = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", a, heads(v))
    ref = ref.transpose(0, 2, 1, 3).reshape(2, n, c)
    with pltpu.force_tpu_interpret_mode():
        got = attention_stream_wide(qkv, scale=scale, num_heads=2,
                                    block_n=tn, block_m=tm)
    tol = 2e-2 if dtype == jnp.bfloat16 else 5e-5
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(ref), atol=tol, rtol=1e-2)


def test_vit_attention_streaming_vjp_matches_naive_grads():
    from mhada_tpu.ops.attention_pallas import attention_pallas

    q, k, v, _ = _inputs(1, 1, 300, 640, 64)
    scale = 0.125

    def loss_naive(args):
        q, k, v = args
        a = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
        )
        return jnp.sum(jnp.sin(jnp.einsum("bhnm,bhmd->bhnd", a, v)))

    def loss_pallas(args):
        q, k, v = args
        return jnp.sum(jnp.sin(attention_pallas(
            q, k, v, scale, block_n=128, block_m=256, streaming=True)))

    g_ref = jax.grad(loss_naive)((q, k, v))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2)


def test_pallas_bf16_matches_naive():
    """bf16 inputs (the TPU inference dtype) through both forward regimes."""
    q, k, v, f = (x.astype(jnp.bfloat16) for x in _inputs(1, 2, 256, 640, 64))
    ref = mhada_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), f.astype(jnp.float32),
                          "softmax")
    with pltpu.force_tpu_interpret_mode():
        single = mhada_attention_pallas(q, k, v, f, streaming=False)
        stream = mhada_attention_pallas(q, k, v, f, block_m=256,
                                        streaming=True)
    for got in (single, stream):
        assert got.dtype == jnp.bfloat16
        err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
        # bf16 P on the MXU (a deliberate perf choice) + E2-M1^2 cancellation
        # leave a small tail of larger errors; bound bulk and tail separately.
        assert np.quantile(err, 0.99) < 5e-2, np.quantile(err, 0.99)
        assert err.max() < 0.5, err.max()


def test_vit_attention_vjp_matches_naive_grads():
    from mhada_tpu.ops.attention_pallas import attention_pallas

    q, k, v, _ = _inputs(1, 2, 128, 128, 64)
    scale = 0.125

    def loss_naive(args):
        q, k, v = args
        a = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
        )
        return jnp.sum(jnp.sin(jnp.einsum("bhnm,bhmd->bhnd", a, v)))

    def loss_pallas(args):
        q, k, v = args
        return jnp.sum(jnp.sin(attention_pallas(q, k, v, scale)))

    g_ref = jax.grad(loss_naive)((q, k, v))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2)


def test_vit_attention_vjp_combined_2048_branch():
    """The 1024 < m <= 2048 backward branch (attention_pallas.py::_attn_bwd)
    forces the COMBINED dQ+dK+dV kernel at key-block 2048; m=1100 lands in
    it with key padding, so the masked tail block is exercised too
    (ADVICE r3: this tile point was previously validated only by on-chip
    probes)."""
    from mhada_tpu.ops.attention_pallas import attention_pallas

    q, k, v, _ = _inputs(1, 1, 300, 1100, 64, scale=0.5)
    scale = 0.125

    def loss_naive(args):
        q, k, v = args
        a = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
        )
        return jnp.sum(jnp.sin(jnp.einsum("bhnm,bhmd->bhnd", a, v)))

    def loss_pallas(args):
        q, k, v = args
        # default blocks: _attn_bwd's 1024<m<=2048 policy branch picks the
        # combined kernel at (256 f32, 2048) regardless of forward tiles
        return jnp.sum(jnp.sin(attention_pallas(q, k, v, scale)))

    g_ref = jax.grad(loss_naive)((q, k, v))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2)


def test_mhada_vjp_two_pass_1024_keyblock_branch():
    """The MHAda backward at m > 1024 (mhada_pallas.py::_mhada_bwd): key
    block clamps to 1024, so m=1100 runs the TWO-PASS streaming backward
    with a padded second key block — the video-shape tile point
    ((512, 1024) in bf16, (256, 1024) here in f32)."""
    q, k, v, f = _inputs(1, 1, 300, 1100, 64, scale=0.5)

    def loss_naive(args):
        q, k, v, f = args
        return jnp.sum(jnp.sin(mhada_attention(q, k, v, f, "softmax")))

    def loss_pallas(args):
        q, k, v, f = args
        return jnp.sum(jnp.sin(mhada_attention_pallas(q, k, v, f)))

    g_ref = jax.grad(loss_naive)((q, k, v, f))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v, f))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=1e-2)


def test_bf16_vjp_matches_f32_naive_grads():
    """bf16 gradients through BOTH kernel families' backward (g shipped in
    the input dtype — the round-5 flash-bwd-convention change: the old f32
    ship made dV/dA run f32 MXU matmuls) stay within bf16 rounding of the
    f32 naive gradients."""
    from mhada_tpu.ops.attention_pallas import attention_pallas

    q, k, v, f = (x.astype(jnp.bfloat16)
                  for x in _inputs(1, 2, 256, 256, 64, scale=0.5))

    def loss_naive(args):
        q, k, v, f = args
        out = mhada_attention(*(x.astype(jnp.float32)
                                for x in (q, k, v, f)), "softmax")
        return jnp.sum(jnp.sin(out))

    def loss_pallas(args):
        return jnp.sum(jnp.sin(mhada_attention_pallas(*args)))

    g_ref = jax.grad(loss_naive)((q, k, v, f))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas)((q, k, v, f))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=6e-2, rtol=5e-2)

    def loss_naive2(args):
        qf, kf, vf = (x.astype(jnp.float32) for x in args)
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * 0.125, -1)
        return jnp.sum(jnp.sin(jnp.einsum("bhqk,bhkd->bhqd", a, vf)))

    def loss_pallas2(args):
        return jnp.sum(jnp.sin(attention_pallas(*args, 0.125)))

    g_ref = jax.grad(loss_naive2)((q, k, v))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_pallas2)((q, k, v))
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=6e-2, rtol=5e-2)


def _tok_inputs(b, n, m, heads, dt=jnp.float32):
    rng = np.random.default_rng((b, n, m, heads))
    c = 64 * heads
    q = jnp.asarray(rng.standard_normal((b, n, c)) * 0.5, dt)
    k = jnp.asarray(rng.standard_normal((b, m, c)) * 0.5, dt)
    v = jnp.asarray(rng.standard_normal((b, m, c)) * 0.5, dt)
    f = jnp.asarray(rng.standard_normal((b, n, c)) * 0.5, dt)
    return q, k, v, f


@pytest.mark.parametrize("b,n,m,heads", [
    (1, 512, 512, 2),      # aligned
    (2, 300, 260, 2),      # query AND key padding
    (1, 640, 1030, 4),     # n != m, both padded
])
def test_mhada_tm_train_vjp_matches_naive(b, n, m, heads):
    """Token-major differentiable MHAda (round 5: removes the 5 head-split
    transposes per block): forward and gradients vs the naive head-major
    formulation, with padding in both token axes."""
    from mhada_tpu.ops.mhada_pallas import mhada_tm_train

    q, k, v, f = _tok_inputs(b, n, m, heads)
    c = 64 * heads

    def naive_tok(q, k, v, f):
        hm = lambda t: t.reshape(
            t.shape[0], t.shape[1], heads, 64).transpose(0, 2, 1, 3)
        out = mhada_attention(hm(q), hm(k), hm(v), hm(f), "softmax")
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    ref = naive_tok(q, k, v, f)
    with pltpu.force_tpu_interpret_mode():
        got = mhada_tm_train(q, k, v, f, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)

    g_ref = jax.grad(lambda a: jnp.sum(jnp.sin(naive_tok(*a))))((q, k, v, f))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(lambda a: jnp.sum(jnp.sin(
            mhada_tm_train(*a, heads))))((q, k, v, f))
    for a_, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=3e-3, rtol=1e-2)


@pytest.mark.parametrize("b,n,heads", [
    (1, 512, 2),
    (2, 300, 2),
    (1, 520, 4),
])
def test_attention_tm_train_vjp_matches_naive(b, n, heads):
    """Token-major differentiable self-attention (round 5): forward and
    gradients through the packed (B, N, 3C) qkv vs the naive path."""
    from mhada_tpu.ops.attention_pallas import attention_tm_train

    rng = np.random.default_rng((b, n, heads))
    c = 64 * heads
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.5, jnp.float32)
    scale = 0.125

    def naive(qkv):
        q, k, v = jnp.split(qkv, 3, -1)
        hm = lambda t: t.reshape(b, n, heads, 64).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", hm(q), hm(k)) * scale, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, hm(v))
        return o.transpose(0, 2, 1, 3).reshape(b, n, c)

    ref = naive(qkv)
    with pltpu.force_tpu_interpret_mode():
        got = attention_tm_train(qkv, scale, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)

    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(naive(x))))(qkv)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(lambda x: jnp.sum(jnp.sin(
            attention_tm_train(x, scale, heads))))(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-2)


def test_adaattn_multihead_tm_path_matches_naive():
    """AdaAttnMultiHead routes to mhada_tm_train when use_pallas is set (the
    round-5 training path): same outputs as the naive module path, and the
    MHADA_TM_TRAIN=0 env hook restores the head-major kernel path."""
    import os as _os

    from mhada_tpu.models.adaformer import AdaAttnMultiHead

    rng = np.random.default_rng(7)
    B, N, M, H = 1, 256, 192, 2
    C = 64 * H
    fc = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    fs = jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
    fcs = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    naive = AdaAttnMultiHead(num_heads=H)
    tm = AdaAttnMultiHead(num_heads=H, use_pallas=True)
    params = naive.init(jax.random.PRNGKey(0), fc, fs, fcs)["params"]
    ref = naive.apply({"params": params}, fc, fs, fcs)
    with pltpu.force_tpu_interpret_mode():
        got = tm.apply({"params": params}, fc, fs, fcs)
        _os.environ["MHADA_TM_TRAIN"] = "0"
        try:
            got_hm = tm.apply({"params": params}, fc, fs, fcs)
        finally:
            _os.environ.pop("MHADA_TM_TRAIN", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_hm), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)
