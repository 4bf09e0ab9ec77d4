"""Halo exchange for sharded Eulerian fields.

The reference is single-device (SURVEY.md §2.5); this is the TPU-native layer
that replaces its absent distributed backend: under ``shard_map`` over an
``(x,)`` device mesh, each shard owns a contiguous x-slab of the domain and
the MPDATA stencil pads are neighbour exchanges over the ICI ring
(``lax.ppermute``) instead of local wrap/edge pads. The global domain is
periodic in x, so shard 0 and shard P-1 are ring neighbours — exactly one
bidirectional ppermute per pad."""

import jax
import jax.numpy as jnp
from jax import lax


def ring_halo_pad(arr, axis, axis_name):
    """halo-1 pad along `axis` with the neighbouring shards' boundary slices
    (global-periodic ring). Equivalent single-device semantics: jnp.pad wrap."""
    n_shards = lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    last = lax.slice_in_dim(arr, arr.shape[axis] - 1, arr.shape[axis], axis=axis)
    first = lax.slice_in_dim(arr, 0, 1, axis=axis)
    # my left halo = left neighbour's last slice (sent forward)
    left_halo = lax.ppermute(last, axis_name, perm=fwd)
    right_halo = lax.ppermute(first, axis_name, perm=bwd)
    return jnp.concatenate([left_halo, arr, right_halo], axis=axis)


def make_sharded_bc(axis_name):
    """MPDATA boundary-condition entry: per-axis pad via ring halo exchange"""
    return ("shard", axis_name)
