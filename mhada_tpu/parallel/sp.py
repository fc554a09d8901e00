"""Sequence (spatial) parallelism: one frame sharded across chips.

Scaling axis the reference cannot express (single GPU, SURVEY.md §5): a
single high-resolution stylization is row-sharded over the mesh so every
chip holds 1/n of the token grid.  TPU-idiomatic decomposition under
``shard_map``:

- **patch embedding / LN / MLP / projections** — token-local, no
  communication (patch conv has kernel == stride, so row shards at
  patch-size granularity never straddle a patch);
- **position embedding** — regridded at the global size, each shard slices
  its rows (models/vit.py sp_axis branch);
- **ViT self-attention** — local queries over all-gathered K/V; the
  (N_loc, N_glob) score tile stays shard-local and the gather rides ICI
  (models/layers.py sp_axis branch);
- **MHAda** — style K/V are per-style constants, replicated; content-side
  instance-norm statistics pmean over the axis (ops/instance_norm.py), so
  attention itself needs no communication at all;
- **decoder** — one all-gather of the small pre-decoder fcs map, then each
  chip decodes its own output slab from a margin-extended slice: the
  convolutional halo (exactly 5 input rows through the conv/upsample
  chain — ``required_decode_margin()`` derives it per stage) is recomputed
  locally instead of exchanged, so the 8x-upsampling conv stack runs
  without any boundary communication.

Everything is exact vs the single-device forward (tests/test_sp.py) up to
matmul reduction order.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map

# decoder stage chain (models/decoder.py): each entry is the ops a stage
# applies, in forward order.  "conv" = reflection-padded 3x3; "up" = 2x
# bilinear (align_corners=False, translation-equivariant at integer coarse
# shifts, so slab-local upsampling matches the global op away from edges).
_DECODER_CHAIN = (
    ("conv", "up"),   # up1   @1x -> 2x
    ("conv",),        # c1    @2x
    ("conv",),        # c2    @2x
    ("conv",),        # c3    @2x
    ("conv", "up"),   # up2   @2x -> 4x
    ("conv",),        # c4    @4x
    ("conv", "up"),   # up3   @4x -> 8x
    ("conv",),        # c5    @8x
    ("conv",),        # c6    @8x
)


def required_decode_margin() -> int:
    """Exact decoder halo in input (fcs) rows, derived by walking the chain
    backward from the kept output region:

    - a 3x3 conv consumes 1 extra valid row per side (its reflect padding
      at slab borders reflects *interior* rows, wrong vs the global frame,
      so the outermost row of validity is lost);
    - a 2x bilinear upsample (align_corners=False) maps output row y to
      source rows {floor(y/2 - 1/4), +1}: H extra fine rows need
      floor(H/2) + 1 extra coarse rows.

    Walk: c6 1, c5 2 | up3.up 2, up3.conv 3, c4 4 | up2.up 3, up2.conv 4,
    c3 5, c2 6, c1 7 | up1.up 4, up1.conv 5  =>  5 fcs rows.  Verified
    tight by tests/test_sp.py (margin-1 produces boundary errors).
    """
    h = 0
    for stage in reversed(_DECODER_CHAIN):
        for op in reversed(stage):
            h = (h // 2 + 1) if op == "up" else h + 1
    return h


_DECODE_MARGIN = required_decode_margin()


def make_sp_stylize_fn(models: Dict, mesh: Mesh, axis: str = "data",
                       dtype=jnp.float32, decode_margin: int = None):
    """Build ``fn(params, content, style_kv) -> cs`` where ``content``
    (1, H, W, 3) is row-sharded over ``axis`` and ``style_kv`` comes from
    ``infer.image.precompute_style_kv`` (replicated).

    H/8 must divide by the axis size.  Returns the full stylized frame,
    row-sharded on the same axis.  ``decode_margin`` overrides the analytic
    decoder halo (``required_decode_margin()``) — test hook only; smaller
    values produce slab-boundary errors.
    """
    margin = _DECODE_MARGIN if decode_margin is None else decode_margin
    from ..models.adaformer import AdaAttnMultiHead
    from ..models.decoder import Decoder

    vit_c = models["vit_c"].clone(sp_axis=axis, tokmaj=False)
    ada = models["adaFormer"]
    dec_packed = ("col" if ada.packed_decoder == "col_tail"
                  else ada.packed_decoder)
    n_sh = mesh.shape[axis]

    def shard_fn(params, content, kv):
        fc = vit_c.apply({"params": params["vit_c"]}, content.astype(dtype))
        c = fc[0].shape[-1]
        h_loc, w = fc[0].shape[1], fc[0].shape[2]
        fc_tok = [f.reshape(1, h_loc * w, c) for f in fc]

        fcs = fc_tok[0]
        pa = params["adaFormer"]
        for i in range(ada.num_layers):
            for j, q_src in ((2 * i, fc_tok[i]), (2 * i + 1, None)):
                blk = AdaAttnMultiHead(
                    ada.num_heads, ada.activation, ada.use_pallas,
                    fuse_prologue=False, sp_axis=axis, name=f"ada{j}",
                )
                fcs = blk.apply(
                    {"params": pa[f"ada{j}"]},
                    q_src if q_src is not None else fcs, None, fcs,
                    style_kv=kv[j],
                )

        # gather the (small) pre-decoder map; decode an overlapping slab
        fcs_loc = fcs.reshape(1, h_loc, w, c)
        fcs_all = jax.lax.all_gather(fcs_loc, axis, axis=1, tiled=True)
        h_glob = h_loc * n_sh
        slab_rows = min(h_loc + 2 * margin, h_glob)
        idx = jax.lax.axis_index(axis)
        start = jnp.clip(idx * h_loc - margin, 0,
                         h_glob - slab_rows)
        slab = jax.lax.dynamic_slice_in_dim(fcs_all, start, slab_rows,
                                            axis=1)
        cs_slab = Decoder(packed=dec_packed, name="decoder").apply(
            {"params": pa["decoder"]}, slab)
        off = (idx * h_loc - start) * 8  # decoder upscales 8x
        cs_loc = jax.lax.dynamic_slice_in_dim(cs_slab, off, h_loc * 8,
                                              axis=1)
        return jnp.clip(cs_loc.astype(jnp.float32), 0, 255)

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=P(None, axis),
    )
    try:
        sharded = shard_map(shard_fn, **kwargs, check_vma=False)
    except TypeError:  # older jax: check_rep instead of check_vma
        sharded = shard_map(shard_fn, **kwargs, check_rep=False)
    return jax.jit(sharded)
