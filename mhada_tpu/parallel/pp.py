"""Pipeline parallelism over the full stylization chain (GPipe-style).

The AdaFormer's 2*num_layers attention blocks all map (B, N, C) tokens to
(B, N, C) tokens — a uniform-activation chain that pipelines cleanly:
stage s (one device of the mesh axis) runs blocks
[blocks_per_stage*s, blocks_per_stage*(s+1)); microbatched frames flow
through stages via ``lax.ppermute`` inside a ``lax.scan`` (M + S - 1
ticks for M microbatches over S stages).

This is a REAL pipeline, not a replicated demo:

- **stage 0 encodes**: the ViT forward of microbatch t runs inside
  ``lax.cond((idx == 0) & (t < M), ...)`` at tick t — an HLO conditional,
  so the patch-embed/attention work executes on the first stage only
  (XLA conditionals are runtime control flow on TPU, not select);
- **the last stage decodes**: the 9-conv upsampling decoder runs inside
  ``lax.cond(idx == S - 1, ...)`` on the fcs each tick emits;
- **activations move only by ppermute**: the (L+1, B, N, C) token bundle
  rides the ring one hop per tick; there is no all_gather anywhere — the
  decoded frames stay on the last stage and the host slices that stage's
  shard out of the stacked (S*M, ...) output;
- **stacked stage weights**: per-stage block parameters are stacked on a
  leading (S,) axis and each device slices its own by ``lax.axis_index``
  — every device runs the SAME compiled program (SPMD), with the
  stage-specific encode/decode guarded by conditionals, not duplicated;
- **query-source selection**: block j queries fc[j//2] when j is even and
  the running fcs when odd (reference adaDecoder.py:262-265).  Which
  source each of a stage's block positions uses varies per stage, so the
  selection is a per-stage one-hot blend over (fc0..fc_{L-1}, fcs) —
  data, not control flow.

tests/test_pp.py keeps the exactness gate (pipelined == single-device)
and adds the structural gate: the traced program contains NO convolution
outside a ``cond`` branch, i.e. encode/decode cannot be running
unconditionally on every stage.

Inference-only orchestration: capability demo for the multi-chip dryrun
and the 8-virtual-device test suite.  Reference chain being staged:
adaDecoder.py:262-268 (encode: vit.py:148-169, decode: conv.py:96-100).
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map


def _stack_stage_params(pa: Dict, n_blocks: int, n_stages: int):
    """Stack ada{j} param trees as (S, per_stage, ...) leaves."""
    per = n_blocks // n_stages
    blocks = [pa[f"ada{j}"] for j in range(n_blocks)]
    stages = [blocks[s * per:(s + 1) * per] for s in range(n_stages)]
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            n_stages, per, *leaves[0].shape),
        *[b for st in stages for b in st],
    )


def make_pp_stylize_fn(models: Dict, mesh: Mesh, axis: str = "data",
                       dtype=jnp.float32):
    """Build ``fn(params, contents, style_kv) -> cs`` pipelining the full
    encode -> MHAda chain -> decode over the ``axis`` mesh dimension.

    contents: (M, 1, H, W, 3) — M microbatch frames (M >= 1); style_kv
    from ``infer.image.precompute_style_kv`` (B=1, replicated).  Returns
    (M, 1, H', W', 3) stylized frames.  The number of blocks
    (2*num_layers) must divide by the axis size.
    """
    from ..models.adaformer import AdaAttnMultiHead
    from ..models.decoder import Decoder

    ada = models["adaFormer"]
    vit_c = models["vit_c"]
    n_blocks = 2 * ada.num_layers
    n_stages = mesh.shape[axis]
    assert n_blocks % n_stages == 0, (n_blocks, n_stages)
    per = n_blocks // n_stages
    n_layers = ada.num_layers

    blk = AdaAttnMultiHead(ada.num_heads, ada.activation, ada.use_pallas,
                           fuse_prologue=False)

    # query-source one-hot per (stage, position): index into
    # [fc_0 .. fc_{L-1}, fcs]  (block j: fc[j//2] if j even else fcs)
    import numpy as np

    sel = np.zeros((n_stages, per, n_layers + 1), np.float32)
    for j in range(n_blocks):
        s, pos = divmod(j, per)
        sel[s, pos, j // 2 if j % 2 == 0 else n_layers] = 1.0

    def shard_fn(params, contents, kv):
        idx = jax.lax.axis_index(axis)
        stage_p = jax.tree_util.tree_map(
            lambda a: a[idx],
            _stack_stage_params(params["adaFormer"], n_blocks, n_stages))
        ks = jnp.stack([k for k, _ in kv])  # (n_blocks, B, M, C)
        vs = jnp.stack([v for _, v in kv])
        stage_kv = [
            (jax.lax.dynamic_index_in_dim(ks, idx * per + pos, 0, False),
             jax.lax.dynamic_index_in_dim(vs, idx * per + pos, 0, False))
            for pos in range(per)
        ]
        sel_s = jnp.asarray(sel)[idx]  # (per, L+1)

        m, b = contents.shape[0], contents.shape[1]
        ps = vit_c.patch_size
        hh, ww = contents.shape[2] // ps, contents.shape[3] // ps
        n_tok = hh * ww
        c = kv[0][1].shape[-1]  # hidden dim (style V channels)

        def encode(x):
            fc = vit_c.apply({"params": params["vit_c"]}, x.astype(dtype))
            toks = jnp.stack([f.reshape(b, n_tok, c) for f in fc])
            # (L+1, B, N, C): [fc_0..fc_{L-1}, fcs_init = fc_0]
            return jnp.concatenate([toks, toks[:1]], axis=0)

        dec = Decoder(packed="col" if ada.packed_decoder == "col_tail"
                      else ada.packed_decoder, name="decoder")

        def decode(fcs):
            cs = dec.apply({"params": params["adaFormer"]["decoder"]},
                           fcs.reshape(b, hh, ww, c))
            return jnp.clip(cs.astype(jnp.float32), 0, 255)

        def stage_compute(act):
            # act: (L+1, B, N, C) = [fc_0..fc_{L-1}, fcs]
            fcs = act[-1]
            for pos in range(per):
                q = jnp.einsum("k,kbnc->bnc", sel_s[pos], act)
                p_pos = jax.tree_util.tree_map(lambda a: a[pos], stage_p)
                fcs = blk.apply({"params": p_pos}, q, None, fcs,
                                style_kv=stage_kv[pos])
                act = act.at[-1].set(fcs)
            return act

        right = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        out_hw = (b, hh * 8, ww * 8, 3)  # decoder upsamples 8x

        def tick(act, t):
            # fill ticks: stage 0 (and only stage 0) encodes microbatch t
            act = jax.lax.cond(
                jnp.logical_and(idx == 0, t < m),
                lambda a: encode(jax.lax.dynamic_index_in_dim(
                    contents, jnp.minimum(t, m - 1), 0, False)),
                lambda a: a,
                act,
            )
            out = stage_compute(act)
            # the last stage (and only it) decodes what it just emitted
            cs = jax.lax.cond(
                idx == n_stages - 1,
                decode,
                lambda f: jnp.zeros(out_hw, jnp.float32),
                out[-1],
            )
            return jax.lax.ppermute(out, axis, right), cs

        init = jnp.zeros((n_layers + 1, b, n_tok, c), dtype)
        _, emitted = jax.lax.scan(tick, init, jnp.arange(m + n_stages - 1))
        # microbatch i leaves the LAST stage at tick i + S - 1; all other
        # stages emitted zeros.  Per-device result: (M, B, H', W', 3).
        return emitted[n_stages - 1:]

    kwargs = dict(mesh=mesh, in_specs=(P(), P(), P()),
                  out_specs=P(axis))  # stack per-stage streams on dim 0
    try:
        sharded = shard_map(shard_fn, **kwargs, check_vma=False)
    except TypeError:
        sharded = shard_map(shard_fn, **kwargs, check_rep=False)

    def fn(params, contents, kv):
        stacked = sharded(params, contents, kv)  # (S*M, B, H', W', 3)
        return stacked[-contents.shape[0]:]  # the last stage's stream

    return jax.jit(fn)
