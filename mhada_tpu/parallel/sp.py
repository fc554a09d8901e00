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
  convolutional halo (~4 input rows through the conv/upsample chain) is
  recomputed locally instead of exchanged, so the 8x-upsampling conv stack
  runs without any boundary communication.

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

# conv/upsample halo of the decoder chain in input (fcs) rows: up1 conv 1 +
# c1-3 at 2x res 1.5 + up2 0.5 + c4/up3 at 4x 0.5 + c5/c6 at 8x 0.5 => ~4;
# +2 slack for the upsamples' edge-replicate behaviour at slab borders
_DECODE_MARGIN = 6


def make_sp_stylize_fn(models: Dict, mesh: Mesh, axis: str = "data",
                       dtype=jnp.float32):
    """Build ``fn(params, content, style_kv) -> cs`` where ``content``
    (1, H, W, 3) is row-sharded over ``axis`` and ``style_kv`` comes from
    ``infer.image.precompute_style_kv`` (replicated).

    H/8 must divide by the axis size.  Returns the full stylized frame,
    row-sharded on the same axis.
    """
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
        slab_rows = min(h_loc + 2 * _DECODE_MARGIN, h_glob)
        idx = jax.lax.axis_index(axis)
        start = jnp.clip(idx * h_loc - _DECODE_MARGIN, 0,
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
