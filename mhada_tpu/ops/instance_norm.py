"""Affine-free instance normalisation, exact PyTorch semantics.

``nn.InstanceNorm2d(C, affine=False)`` normalises each (batch, channel) plane
over its spatial extent with biased variance and eps=1e-5 (reference
network/adaDecoder.py:41-43,147-149).  NHWC layout here.
"""

import jax.numpy as jnp
from jax import lax


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x: (B, H, W, C) -> per-(b, c) spatially normalised output."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def instance_norm_tokens(
    x: jnp.ndarray, eps: float = 1e-5, axis_name: str | None = None
) -> jnp.ndarray:
    """Token layout variant: x (B, N, C), normalised over N per (b, c).

    ``axis_name``: inside shard_map with the token axis sharded over that
    mesh axis, the statistics are reduced globally (pmean over shards) so
    the result equals the unsharded computation (sequence parallelism,
    parallel/sp.py).
    """
    mean = jnp.mean(x, axis=1, keepdims=True)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    if axis_name is not None:
        var = lax.pmean(var, axis_name)
    return (x - mean) * lax.rsqrt(var + eps)
