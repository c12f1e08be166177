"""Pallas TPU kernels: the fused sufficient-statistics + likelihood path.

The reference's only native-code hot spots are three Numba kernels
(sbayes/util.py:1373 ``dirichlet_categorical_logpdf``,
likelihood.py:104 ``compute_component_likelihood``, util.py:39 ``gammaln``).
Their TPU-native equivalent is this fused kernel: for each chain, form the
source-masked one-hot features in VMEM, contract them onto the MXU to get
per-group state counts, and reduce the collapsed Dirichlet-categorical
log-pdf — one pass over HBM for the whole likelihood, no materialized
(N, F, S) masked intermediates.

Mosaic constraints shape the design: no 3-D vector reshapes are allowed
in-kernel (infer-vector-layout rejects (N, F*S) -> (N, F, S) casts), so
everything stays 2-D with the feature/state axes flattened. The two
state-axis rearrangements become MXU matmuls against tiny host-built
selection matrices:
  * expand  (F, F*S):  src0 @ expand  broadcasts per-feature source masks
    over the state axis,
  * reduce  (F*S, F):  X @ reduce     sums the state axis per feature.

Grid: one program per chain; all per-chain tensors fit comfortably in VMEM
for reference-scale data (e.g. south_america: features 86 KB, source 43 KB).
Falls back to the XLA einsum path for shapes that exceed VMEM.

lgamma is implemented in-kernel via an 8-step shifted Stirling series
(Mosaic has no lgamma primitive). Validated against the XLA path in
interpreter mode (tests/test_pallas.py) and compiled+validated on a real
TPU chip through the axon tunnel (round 2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 100 * 1024 * 1024  # leave headroom below ~128MB v5e VMEM limit


_HALF_LOG_2PI = 0.9189385332046727


def lgamma_stirling(z):
    """log-gamma for z > 0 via an 8-step shift + Stirling series.

    Mosaic (Pallas TPU) has no lgamma primitive; this uses only log and
    polynomials (VPU-friendly). Shifting guarantees the series argument is
    >= 8 where the 3-term Stirling expansion is accurate to ~1e-7:
    lgamma(z) = lgamma(z+8) - sum_{k=0..7} log(z+k).
    """
    shift_logs = jnp.zeros_like(z)
    zz = z
    for _ in range(8):
        shift_logs = shift_logs + jnp.log(zz)
        zz = zz + 1.0
    inv = 1.0 / zz
    inv2 = inv * inv
    series = inv * (1.0 / 12.0 + inv2 * (-1.0 / 360.0 + inv2 * (1.0 / 1260.0)))
    return (zz - 0.5) * jnp.log(zz) - zz + _HALF_LOG_2PI + series - shift_logs


def _dirichlet_categorical_total_2d(counts, conc, reduce_mat):
    """Scalar sum of the collapsed categorical log-pdf over groups/features.

    counts, conc: (G, F*S) with non-applicable states at conc <= 0;
    reduce_mat: (F*S, F) state-axis summation matrix.
    """
    n = jnp.dot(counts, reduce_mat, preferred_element_type=jnp.float32)      # (G, F)
    sum_a = jnp.dot(conc, reduce_mat, preferred_element_type=jnp.float32)    # (G, F)
    const = lgamma_stirling(sum_a) - lgamma_stirling(n + sum_a)
    safe_conc = jnp.maximum(conc, 1e-6)
    series_el = jnp.where(
        conc > 0, lgamma_stirling(counts + safe_conc) - lgamma_stirling(safe_conc), 0.0
    )
    series = jnp.dot(series_el, reduce_mat, preferred_element_type=jnp.float32)
    return (const + series).sum()


def _loglh_kernel(
    features_ref,   # (N, F*S) f32, shared
    groups_ref,     # (Cm1*Gmax, N) f32, shared
    conc_cl_ref,    # (K, F*S) f32, shared (zeros on non-applicable)
    conc_conf_ref,  # (Cm1*Gmax, F*S) f32, shared
    expand_ref,     # (F, F*S) f32: E[f, f*S+s] = 1
    reduce_ref,     # (F*S, F) f32: E^T
    clusters_ref,   # (1, K, N) f32, per chain
    source_ref,     # (1, C, N, F) f32, per chain (component-major planes)
    out_ref,        # (B, 1) f32 log-likelihoods
    *,
    K, N, F, S, C, Gmax,
):
    feats = features_ref[...]            # (N, F*S)
    expand = expand_ref[...]             # (F, F*S)
    reduce_mat = reduce_ref[...]         # (F*S, F)

    total = jnp.zeros((), jnp.float32)

    # --- cluster component ---
    src0 = source_ref[0, 0, :, :]                                  # (N, F)
    mask0 = jnp.dot(src0, expand, preferred_element_type=jnp.float32)  # (N, F*S)
    fx0 = feats * mask0
    cl_counts = jnp.dot(
        clusters_ref[0], fx0, preferred_element_type=jnp.float32
    )  # (K, F*S)
    total += _dirichlet_categorical_total_2d(cl_counts, conc_cl_ref[...], reduce_mat)

    # --- confounder components ---
    for c in range(C - 1):
        src_c = source_ref[0, c + 1, :, :]                          # (N, F)
        mask = jnp.dot(src_c, expand, preferred_element_type=jnp.float32)
        fx = feats * mask
        g = groups_ref[c * Gmax : (c + 1) * Gmax, :]                # (Gmax, N)
        counts = jnp.dot(g, fx, preferred_element_type=jnp.float32)
        conc = conc_conf_ref[c * Gmax : (c + 1) * Gmax, :]
        total += _dirichlet_categorical_total_2d(counts, conc, reduce_mat)

    # The output block covers the whole (B, 1) array; each grid step writes
    # its own row (TPU lowering requires full-array or tile-aligned blocks).
    out_ref[pl.program_id(0), 0] = total


def fits_in_vmem(K, N, F, S, C, Gmax) -> bool:
    """Conservative check that the kernel's working set fits in VMEM."""
    n_bytes = 4 * (
        N * F * S            # features
        + (C - 1) * Gmax * N  # groups
        + F * S * (K + (C - 1) * Gmax)  # concentrations
        + 2 * F * S * F      # expand + reduce selection matrices
        + K * N              # clusters
        + N * F * C          # source
        + 2 * N * F * S      # masked intermediate + headroom
    )
    return n_bytes < VMEM_BUDGET_BYTES


def make_pallas_log_likelihood(consts, interpret: bool = False):
    """Build ``log_lh(clusters_b, source_b) -> (B,)``: the fused Pallas
    likelihood over a batch of chains.

    Args:
        consts: ModelConstants.
        interpret: run in interpreter mode (for CPU tests).
    """
    K, N, F, S, C, Gmax = consts.K, consts.N, consts.F, consts.S, consts.C, consts.Gmax
    features2d = np.asarray(consts.features, np.float32).reshape(N, F * S)
    groups2d = np.asarray(consts.groups, np.float32).reshape((C - 1) * Gmax, N)
    conc_cl2d = np.broadcast_to(
        np.asarray(consts.conc_cluster, np.float32).reshape(1, F * S), (K, F * S)
    ).copy()
    conc_conf2d = np.asarray(consts.conc_conf, np.float32).reshape((C - 1) * Gmax, F * S)
    reduce_mat = np.zeros((F * S, F), np.float32)
    reduce_mat[np.arange(F * S), np.arange(F * S) // S] = 1.0
    expand_mat = reduce_mat.T.copy()

    kernel = functools.partial(_loglh_kernel, K=K, N=N, F=F, S=S, C=C, Gmax=Gmax)

    def log_lh_batch(clusters_b, source_b):
        """clusters_b: (B, K, N) bool; source_b: (B, N, F, C) bool -> (B,) f32."""
        B = clusters_b.shape[0]
        clusters_f = clusters_b.astype(jnp.float32)
        # component-major planes: (B, C, N, F)
        source_f = jnp.transpose(source_b.astype(jnp.float32), (0, 3, 1, 2))

        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((N, F * S), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(((C - 1) * Gmax, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F * S), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(((C - 1) * Gmax, F * S), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, F * S), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F * S, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, N, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            interpret=interpret,
        )(
            jnp.asarray(features2d),
            jnp.asarray(groups2d),
            jnp.asarray(conc_cl2d),
            jnp.asarray(conc_conf2d),
            jnp.asarray(expand_mat),
            jnp.asarray(reduce_mat),
            clusters_f,
            source_f,
        )
        return out[:, 0]

    return log_lh_batch
