"""Device residency helpers.

On the axon (tunneled TPU) platform, ``jax.device_put`` arrays behave like
host-backed buffers: every subsequent execute re-ships them over the tunnel
(measured 2.5 s/iter vs 47 ms/iter for a 130 MB param tree).  Arrays that are
*outputs of a jitted computation* are genuinely chip-resident, so we commit
trees to the device by passing them through a jitted identity.
"""

import jax


@jax.jit
def _identity(tree):
    return jax.tree_util.tree_map(lambda x: x + 0, tree)


def commit_to_device(tree):
    """Return a copy of ``tree`` whose leaves are device-resident outputs."""
    out = _identity(tree)
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()
        break
    return out
