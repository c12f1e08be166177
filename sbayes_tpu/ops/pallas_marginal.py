"""Pallas TPU kernel: fused cluster-membership marginal mixture.

The gibbsish operators' hot math (`OperatorFactory._log_marginal_with_without`,
reference operators.py:1035-1095) evaluates, for every object n:

    log_m[n] = sum_f log( sum_c wh[f,c]*avail[n,c]*lh_c[n,f]
                          / sum_c wh[f,c]*avail[n,c] )

with lh_0 the proposal-cluster-effect likelihood and lh_c per-object
confounder-group effects. The XLA path streams the feature tensor ~3x and
spills ~(N,F) f32 temporaries per tile; this kernel computes the whole
mixture in VMEM in ONE pass over the features — the HBM-bound optimum.

Mosaic constraints shape the design (cf. ops/pallas_kernels.py): no 3-D
vector ops and 128-aligned block lanes, so the feature tensor is
pre-laid-out host-side as 2-D tiles of FCP=512 features with STATE-MAJOR
contiguous chunks:

    feats_tl[n, t*S*FCP + s*FCP + j] = features[n, t*FCP + j, s]

so the in-kernel state reduction is S static column-slice adds. Features
are padded up to a multiple of FCP with (na=1, wh=1) entries whose mixture
is exactly 1 (log contribution 0). Per-object confounder effects expand
via an MXU matmul against the one-hot group matrix; both availability
patterns (current / cluster-flipped) are mixed in the same pass.

Outputs: (N, 2) partial log-marginals [without, with], accumulated over
the feature-tile grid axis.

Static specialization (the VPU-transcendental diet): the kernel is
built per (ratio, heat) combination because log/exp are the dominant
per-element VPU cost once the feature stream is fused:

- ``heat=False`` (gibbsish + jump: the extra effect-heating exponent is
  identically 1 there) removes the 2x(log+exp) of ``x**invT`` per
  element — invT arrives as a *traced* SMEM scalar, so without the
  static flag the transcendentals always execute.
- ``ratio=True`` (gibbsish + wide raw-probs, which only consume
  ``log_m1 - log_m0`` through a sigmoid) takes ONE effect row, computes
  the with/without mixtures' ratio and a SINGLE log per element
  (instead of two output logs + a duplicated effect-row reduction),
  emitting ``(N, 1)`` signed log-odds directly.
- ``ratio=False`` keeps both absolute marginals — required by the
  ClusterJump's float32-EPS flooring semantics (reference
  operators.py:1679-1722), where the two marginals are exponentiated
  and floored *separately*.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TINY = 1e-35
FCP = 512  # features per kernel tile (lane dim S*FCP and FCP both %128)
LN2 = 0.6931471805599453
_LOG_GROUP = 8  # lanes folded into one mantissa product per log call


def _sum_log_ratio_grouped(num, den):
    """``sum(log(num / den), axis=1)`` with 1/_LOG_GROUP the
    transcendentals and no per-lane divides.

    The per-lane ``log`` (and the divides feeding it) are the marginal
    kernel's ratio-tail VPU cost. Split x = m * 2^e with integer ops
    (inputs must be >= the smallest NORMAL f32: callers clamp to TINY),
    take the per-lane exponent DIFFERENCE (exact integers), and take
    logs only of grouped mantissa-product quotients: m in [1, 2), so a
    product of 8 stays in [1, 256) and the quotient in (2^-8, 2^8) — no
    overflow handling needed.

    The num/den pairing is load-bearing for accuracy: summing
    ``log num`` and ``log den`` separately and subtracting would cancel
    two O(|sum log|) totals whose f32 ulp exceeds the result (measured
    2e-4 relative on real TPU); the per-lane exponent diff and per-group
    mantissa quotient keep every intermediate at the magnitude of its
    contribution (~1e-6 relative, parity-probe verified). Rounding is
    ~1 ulp per product step — proposal-shaping only (the marginal never
    enters the MH accept ratio; forward and backward q come from the
    same kernel).

    num, den: (nb, L) f32 > 0, L % _LOG_GROUP == 0. Returns (nb, 1) f32.
    """
    from jax import lax as _lax

    i_n = _lax.bitcast_convert_type(num, jnp.int32)
    i_d = _lax.bitcast_convert_type(den, jnp.int32)
    e = (_lax.shift_right_logical(i_n, 23)
         - _lax.shift_right_logical(i_d, 23))        # per-lane exponent diff
    m_n = _lax.bitcast_convert_type(
        (i_n & 0x007FFFFF) | 0x3F800000, jnp.float32)  # mantissa in [1, 2)
    m_d = _lax.bitcast_convert_type(
        (i_d & 0x007FFFFF) | 0x3F800000, jnp.float32)
    L = num.shape[1]
    g = L // _LOG_GROUP
    pn = m_n[:, :g]
    pd = m_d[:, :g]
    for k in range(1, _LOG_GROUP):
        pn = pn * m_n[:, k * g:(k + 1) * g]
        pd = pd * m_d[:, k * g:(k + 1) * g]
    e_sum = jnp.sum(e, axis=1, keepdims=True)
    return (LN2 * e_sum.astype(jnp.float32)
            + jnp.sum(jnp.log(pn / pd), axis=1, keepdims=True))


def _n_tiles(F):
    return -(-F // FCP)


def tile_layout_host(x, S):
    """(N, F, S) -> (N, T*S*FCP) state-major padded tiles (host, numpy)."""
    x = np.asarray(x)
    n, F, S_ = x.shape
    assert S_ == S
    t = _n_tiles(F)
    xp = np.zeros((n, t * FCP, S), dtype=np.float32)
    xp[:, :F] = x
    return np.ascontiguousarray(
        xp.reshape(n, t, FCP, S).transpose(0, 1, 3, 2).reshape(n, t * S * FCP)
    )


def na_layout_host(na):
    """(N, F) bool -> (N, T*FCP) f32, padded features marked NA."""
    na = np.asarray(na, bool)
    n, F = na.shape
    t = _n_tiles(F)
    out = np.ones((n, t * FCP), np.float32)
    out[:, :F] = na.astype(np.float32)
    return out


def idx_layout_host(x, S):
    """(N, F, S) one-hot -> (N, T*FCP) int8 state indices (S = NA/padding).

    The compressed feature layout: 1 byte per (object, feature) instead
    of S one-hot bf16 values (10x less HBM feature traffic at S=5, and
    no second resident copy of the features for the kernel). The kernel
    expands on the fly with S lane-wise selects — same op count as the
    one-hot multiply-accumulate it replaces. The NA/padding sentinel S
    never matches a select, so those lanes contribute 0 exactly like an
    all-zero one-hot row."""
    x = np.asarray(x)
    n, F, S_ = x.shape
    assert S_ == S and S < 127
    t = _n_tiles(F)
    idx = np.full((n, t * FCP), S, np.int8)
    has = x.any(-1)
    idx[:, :F] = np.where(has, x.argmax(-1), S).astype(np.int8)
    return idx


def tile_layout_eff(eff, F):
    """Device-side: (..., F, S) -> (..., T*S*FCP) matching tile_layout_host."""
    *lead, F_, S = eff.shape
    t = _n_tiles(F)
    pad = t * FCP - F
    eff = jnp.pad(eff, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
    return (
        eff.reshape(*lead, t, FCP, S)
        .swapaxes(-1, -2)
        .reshape(*lead, t * S * FCP)
    )


def wh_layout(wh, F):
    """(C, F) -> (C, T*FCP), padded features get weight 1 (so their
    mixture is exactly 1 and the log contribution is 0)."""
    C, F_ = wh.shape
    pad = _n_tiles(F) * FCP - F
    return jnp.pad(wh, ((0, 0), (0, pad)), constant_values=1.0)


def _marginal_kernel(
    *refs,
    S, C, n_conf, ratio, heat, two_eff, idx_feats, fusedmix, grouplog,
):
    """Arg order (heat variants prepend invT):

        [invT_ref]       (1, 1) f32 SMEM: extra heating exponent for lh0
        feats_ref        (nb, S*FCP) bf16/f32 tile (state-major chunks),
                           or (nb, FCP) int8 state indices when idx_feats
        na_ref           (nb, FCP) f32 (1 = NA); ABSENT when idx_feats
                           (sentinel S in the index layout encodes NA)
        peff_ref         (1 or 2, S*FCP) f32 cluster effects, tiled layout:
                           ratio=False: row 0 pairs with hc (the "cur"
                           mixture), row 1 with hc_flip (the jump passes
                           (eff_src, eff_tgt) with hc == hc_flip to get
                           both jump marginals in ONE pass over the
                           features). ratio=True: ONE row, shared.
        wh_ref           (C, FCP) f32 heated weights tile
        hc_ref           (nb, C) f32 current availability
        hcf_ref          (nb, C) f32 flipped availability
        incl_ref         (nb, 1) f32 1 = object currently in the cluster
        group_refs       n_conf x (nb, G) f32
        ceff_refs        n_conf x (G, S*FCP) f32
        out_ref          (nb, 2) f32 [log m0, log m1], or (nb, 1) signed
                           log-odds log m1 - log m0 when ratio=True
    """
    if heat:
        invT_ref, *refs = refs
    if idx_feats:
        # NA rides in the index layout itself (sentinel S marks NA and
        # padding) — no separate NA stream.
        feats_ref, peff_ref, wh_ref, hc_ref, hcf_ref, incl_ref, *rest = refs
    else:
        (feats_ref, na_ref, peff_ref, wh_ref, hc_ref, hcf_ref, incl_ref,
         *rest) = refs
    if fusedmix:
        # Fused-components layout: ONE availability-scaled stacked group
        # one-hot (nb, n_conf*G) and ONE weight-prescaled stacked effect
        # matrix (n_conf*G, S*FCP) — the whole confounder mixture is a
        # single MXU matmul + ONE state reduction instead of n_conf
        # matmul/select/weight chains (see make_pallas_marginal).
        bconf_ref, ceff_st_ref, out_ref = rest
    else:
        group_refs = rest[:n_conf]           # (nb, G) f32 each
        ceff_refs = rest[n_conf:2 * n_conf]  # (G, S*FCP) f32 each
        out_ref = rest[2 * n_conf]           # (nb, 2) or (nb, 1) f32

    j = pl.program_id(1)

    if idx_feats:
        idx = feats_ref[...].astype(jnp.int32)      # (nb, FCP)
        na = (idx == S).astype(jnp.float32)         # (nb, FCP)
        not_na = 1.0 - na
        # In-register expansion of the int8 index layout to the one-hot
        # tile (S lane-aligned compares + a lane concat, once per tile);
        # the mixture math below is then IDENTICAL to the one-hot path.
        # (A per-state `where(idx==s, eff[:, s-chunk], 0)` formulation is
        # NOT Mosaic-compilable when eff is a broadcast (1, S*FCP) row:
        # the broadcast folds through the lane-offset slice and trips
        # "Invalid input layout" on vector.broadcast.)
        feats = jnp.concatenate(
            [(idx == s).astype(jnp.float32) for s in range(S)], axis=1
        )                                           # (nb, S*FCP)
    else:
        na = na_ref[...].astype(jnp.float32)        # (nb, FCP)
        not_na = 1.0 - na
        feats = feats_ref[...].astype(jnp.float32)  # (nb, S*FCP)

    def state_select(eff):
        x = feats * eff
        acc = x[:, 0:FCP]
        for s in range(1, S):
            acc = acc + x[:, s * FCP:(s + 1) * FCP]
        return acc

    # component-0: proposal cluster effects (+ optional extra heating,
    # compiled out entirely for the heat=False variants). In the fusedmix
    # form the per-component NA fix collapses into ONE global fix at the
    # end (Σ_c hc·wh·(lh_c·not_na + na) == not_na·Σ_c hc·wh·lh_c + na·z).
    if heat:
        invT = invT_ref[0, 0]

        def finish0(x):
            x = jnp.exp(jnp.log(jnp.maximum(x, TINY)) * invT)
            return x if fusedmix else x * not_na + na
    else:
        def finish0(x):
            return x if fusedmix else x * not_na + na

    lh0a = finish0(state_select(peff_ref[0:1, :]))
    lh0b = (lh0a if (ratio and not two_eff)
            else finish0(state_select(peff_ref[1:2, :])))

    wh = wh_ref[...]                                # (C, FCP)
    hc = hc_ref[...]                                # (nb, C)
    hcf = hcf_ref[...]

    z_cur = jnp.dot(hc, wh, preferred_element_type=jnp.float32)     # (nb, FCP)
    z_flip = jnp.dot(hcf, wh, preferred_element_type=jnp.float32)

    if fusedmix:
        # ONE matmul over all confounders (group one-hot pre-scaled by
        # availability, effects pre-scaled by the heated weights) + ONE
        # state reduction, shared by both availability patterns (the
        # cluster flip only touches component 0). With mm_bf16 the
        # operands arrive bf16 (f32 accumulate): the MXU runs this
        # matmul — the kernel's dominant cost, since K pads to the
        # systolic depth of 128 — at the bf16 rate. The rounding only
        # perturbs the confounder BACKGROUND mixture shared by s_cur
        # and s_flip (the cluster-effect row stays f32), and the
        # marginal shapes proposals only (forward and backward q come
        # from this same kernel; MH accept uses the exact-delta path),
        # so detailed balance is exact.
        conf_sel = state_select(
            jnp.dot(bconf_ref[...], ceff_st_ref[...],
                    preferred_element_type=jnp.float32))             # (nb, FCP)
        s_cur = conf_sel + (hc[:, 0:1] * lh0a) * wh[0:1, :]
        s_flip = conf_sel + (hcf[:, 0:1] * lh0b) * wh[0:1, :]
        s_cur = s_cur * not_na + na * z_cur
        s_flip = s_flip * not_na + na * z_flip
    else:
        s_cur = (hc[:, 0:1] * lh0a) * wh[0:1, :]
        s_flip = (hcf[:, 0:1] * lh0b) * wh[0:1, :]

        for i_c in range(n_conf):
            eff = jnp.dot(group_refs[i_c][...], ceff_refs[i_c][...],
                          preferred_element_type=jnp.float32)   # (nb, S*FCP)
            lh_c = state_select(eff)
            lh_c = lh_c * not_na + na
            s_cur = s_cur + (hc[:, 1 + i_c:2 + i_c] * lh_c) * wh[1 + i_c:2 + i_c, :]
            s_flip = s_flip + (hcf[:, 1 + i_c:2 + i_c] * lh_c) * wh[1 + i_c:2 + i_c, :]

    incl = incl_ref[...]                            # (nb, 1)

    if ratio and grouplog:
        # log m1 - log m0 = Σ_f log[(s_cur·z_flip) / (s_flip·z_cur)]
        # with the per-lane divides and log replaced by the grouped
        # log-ratio (no divides, 1/_LOG_GROUP the transcendentals). NA
        # lanes have s == z on both sides, so num and den are the
        # bitwise-same product and cancel exactly.
        u = jnp.maximum(s_cur * z_flip, TINY)
        v = jnp.maximum(s_flip * z_cur, TINY)
        pm = (2.0 * incl - 1.0) * _sum_log_ratio_grouped(u, v)
    elif ratio:
        # log(lh_cur / lh_flip) via two O(1)-magnitude quotients and ONE
        # log; the incl sign turns it into log m1 - log m0 (the sign is
        # per-object, so it distributes over the feature-tile sum).
        r = (s_cur / jnp.maximum(s_flip, TINY)) * (z_flip / jnp.maximum(z_cur, TINY))
        lr = jnp.log(jnp.maximum(r, TINY))
        pm = (2.0 * incl - 1.0) * jnp.sum(lr, axis=1, keepdims=True)  # (nb, 1)
    elif grouplog:
        # Absolute marginals via the grouped log-ratio: Σ log(s/z) with
        # num/den paired per lane (no large-sum cancellation), and the
        # per-object 0/1 incl mix distributed over the feature sums.
        pm_cur = _sum_log_ratio_grouped(jnp.maximum(s_cur, TINY),
                                        jnp.maximum(z_cur, TINY))
        pm_flip = _sum_log_ratio_grouped(jnp.maximum(s_flip, TINY),
                                         jnp.maximum(z_flip, TINY))
        pm1 = incl * pm_cur + (1.0 - incl) * pm_flip
        pm0 = incl * pm_flip + (1.0 - incl) * pm_cur
        pm = jnp.concatenate([pm0, pm1], axis=1)    # (nb, 2)
    else:
        lh_cur = s_cur / jnp.maximum(z_cur, TINY)
        lh_flip = s_flip / jnp.maximum(z_flip, TINY)
        lh_with = incl * lh_cur + (1.0 - incl) * lh_flip
        lh_without = incl * lh_flip + (1.0 - incl) * lh_cur

        pm1 = jnp.sum(jnp.log(jnp.maximum(lh_with, TINY)), axis=1, keepdims=True)
        pm0 = jnp.sum(jnp.log(jnp.maximum(lh_without, TINY)), axis=1, keepdims=True)
        pm = jnp.concatenate([pm0, pm1], axis=1)    # (nb, 2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = pm

    @pl.when(j > 0)
    def _acc():
        out_ref[...] = out_ref[...] + pm


def pick_row_block(n: int, target: int = 448):
    """Largest divisor of n that is <= target and a multiple of 8 (or n
    itself when n is small)."""
    best = None
    for d in range(1, n + 1):
        if n % d == 0 and d <= target and d % 8 == 0:
            best = d
    if best is None:
        best = n if n <= target else None
    return best


def make_pallas_marginal(consts, interpret: bool = False,
                         ratio: bool = False, heat: bool = True,
                         two_eff: bool = False, fusedmix: bool | None = None,
                         mm_bf16: bool | None = None,
                         grouplog: bool | None = None):
    """Build the fused marginal over the pre-tiled resident feature
    layout; returns None when unavailable (no layout / bad shapes).

    ratio=False: ``marginal(p_eff_tl (2, TSF), wh_tl, hc, hc_flip, incl,
    conf_eff_tl[, invT]) -> (log_m0, log_m1)``.
    ratio=True:  ``marginal(p_eff_tl (1, TSF), ...) -> log_m1 - log_m0``
    (the signed log-odds; for callers that only feed a sigmoid).
    ratio=True, two_eff=True: two DISTINCT effect rows (row 0 pairs with
    hc, row 1 with hc_flip) but still the single-log ratio output — the
    log-space jump proposal's shape (pass hc_flip == hc there).
    heat=True variants take the extra traced ``invT`` effect-heating
    exponent; heat=False variants compile the transcendentals out.
    Feature layout: int8 state indices (``consts.features_idx_tl``, 1
    byte/element, expanded in-kernel) when built, else the one-hot
    bf16 tiles (``consts.features_tl``).
    fusedmix (default on, ``SBAYES_TPU_PALLAS_FUSEDMIX=0`` to disable):
    stack every confounder's effect rows — pre-scaled by their heated
    mixture weights — into ONE (n_conf*G, S*FCP) matrix and the group
    one-hots — pre-scaled by availability — into ONE (N, n_conf*G)
    matrix, so the whole confounder mixture is a single MXU matmul and a
    single state reduction per tile (shared by both availability
    patterns) instead of n_conf matmul/select/NA-fix/weight chains. Cuts
    the per-element VPU op count ~30% at n_conf=2; exact same math.
    mm_bf16 (default on, ``SBAYES_TPU_PALLAS_BF16MM=0`` to disable;
    implies fusedmix): feed the stacked confounder matmul bf16 operands
    (f32 accumulate). The matmul is the kernel's dominant cost — its
    inner dim n_conf*G pads to the MXU systolic depth of 128 — and bf16
    runs it at 4x the f32 rate. Statistically safe: the marginal shapes
    proposals only, and forward/backward q come from the same kernel.
    """
    idx_feats = getattr(consts, "features_idx_tl", None) is not None
    if not idx_feats and getattr(consts, "features_tl", None) is None:
        return None
    N, F, S, C = consts.N, consts.F, consts.S, consts.C
    n_conf = C - 1
    G = consts.Gmax
    nb = pick_row_block(N)
    if nb is None:
        return None
    t = _n_tiles(F)
    n_eff_rows = 1 if (ratio and not two_eff) else 2
    out_w = 1 if ratio else 2
    if fusedmix is None:
        import os
        fusedmix = os.environ.get("SBAYES_TPU_PALLAS_FUSEDMIX", "1") != "0"
    fusedmix = fusedmix and n_conf > 0
    if mm_bf16 is None:
        import os
        mm_bf16 = os.environ.get("SBAYES_TPU_PALLAS_BF16MM", "1") != "0"
    mm_bf16 = mm_bf16 and fusedmix
    if grouplog is None:
        import os
        # Grouped-log tail (see _sum_log_ratio_grouped): default OFF by
        # measurement — on real TPU the Mosaic lowering of the integer
        # exponent/mantissa ops costs slightly MORE than the saved
        # transcendentals (interleaved 10k x 5k shoot-out: 29.4 vs 28.4
        # ms, benchmarks/grouplog_probe.py) and it widens the strict
        # parity gap vs the XLA path (2e-4 vs 4e-7 relative). Kept as a
        # tested variant; SBAYES_TPU_PALLAS_GROUPLOG=1 opts in.
        grouplog = os.environ.get("SBAYES_TPU_PALLAS_GROUPLOG", "0") == "1"

    kernel = functools.partial(_marginal_kernel, S=S, C=C, n_conf=n_conf,
                               ratio=ratio, heat=heat, two_eff=two_eff,
                               idx_feats=idx_feats, fusedmix=fusedmix,
                               grouplog=grouplog)


    def marginal(p_eff_tl, wh_tl, hc, hc_flip, incl, conf_eff_tl, invT=None):
        """p_eff_tl: (2, T*S*FCP) f32 — row 0 mixes under hc, row 1 under
        hc_flip ((eff_src, eff_tgt) with hc_flip == hc for the jump
        marginals) — or (1, T*S*FCP) shared when ratio=True; wh_tl:
        (C, T*FCP) f32 (heated, padded with 1s); hc/hc_flip: (N, C) f32;
        incl: (N, 1) f32; conf_eff_tl: (C-1, G, T*S*FCP) f32; invT:
        scalar f32 (heat variants only)."""
        in_specs, args = [], []
        if heat:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))      # invT
            args.append(invT.reshape(1, 1))
        if idx_feats:
            # NA is encoded as sentinel S inside the index layout: no
            # separate NA stream (halves the idx path's HBM traffic).
            in_specs.append(pl.BlockSpec((nb, FCP), lambda i, j: (i, j)))
            args.append(jnp.asarray(consts.features_idx_tl))
        else:
            in_specs += [
                pl.BlockSpec((nb, S * FCP), lambda i, j: (i, j)),       # feats
                pl.BlockSpec((nb, FCP), lambda i, j: (i, j)),           # na
            ]
            args += [jnp.asarray(consts.features_tl), jnp.asarray(consts.na_tl)]
        in_specs += [
            pl.BlockSpec((n_eff_rows, S * FCP), lambda i, j: (0, j)),   # p_eff
            pl.BlockSpec((C, FCP), lambda i, j: (0, j)),                # wh
            pl.BlockSpec((nb, C), lambda i, j: (i, 0)),                 # hc
            pl.BlockSpec((nb, C), lambda i, j: (i, 0)),                 # hc_flip
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0)),                 # incl
        ]
        args += [p_eff_tl, wh_tl, hc, hc_flip, incl]
        if fusedmix:
            # Availability-scaled stacked group one-hot (N, n_conf*G) and
            # heated-weight-prescaled stacked effects (n_conf*G, T*S*FCP):
            # wh rows expand FCP -> S*FCP state-major to match the tile
            # layout of conf_eff_tl. Built with jnp ops (consts.groups may
            # be traced when consts arrive as jit args); XLA hoists the
            # constant concat.
            groups_st = jnp.concatenate(
                [jnp.asarray(consts.groups[i]).T for i in range(n_conf)],
                axis=1).astype(jnp.float32)
            bconf = groups_st * jnp.repeat(hc[:, 1:], G, axis=1)
            whc = wh_tl[1:].reshape(n_conf, t, 1, FCP)
            whc_exp = jnp.broadcast_to(
                whc, (n_conf, t, S, FCP)).reshape(n_conf, t * S * FCP)
            ceff_st = (conf_eff_tl * whc_exp[:, None, :]).reshape(
                n_conf * G, t * S * FCP)
            if mm_bf16:
                # bf16 operands, f32 accumulate: 4x MXU rate on the
                # dominant matmul + half the ceff stream. bconf is
                # exactly representable (0/1 x availability 0/1);
                # ceff_st rounds to ~2^-9 relative — proposal-shaping
                # only (see kernel comment).
                bconf = bconf.astype(jnp.bfloat16)
                ceff_st = ceff_st.astype(jnp.bfloat16)
            in_specs += [
                pl.BlockSpec((nb, n_conf * G), lambda i, j: (i, 0)),
                pl.BlockSpec((n_conf * G, S * FCP), lambda i, j: (0, j)),
            ]
            args += [bconf, ceff_st]
        else:
            for i_c in range(n_conf):
                in_specs.append(pl.BlockSpec((nb, G), lambda i, j: (i, 0)))
                args.append(jnp.asarray(consts.groups[i_c]).T)
            for i_c in range(n_conf):
                in_specs.append(pl.BlockSpec((G, S * FCP), lambda i, j: (0, j)))
                args.append(conf_eff_tl[i_c])

        out = pl.pallas_call(
            kernel,
            grid=(N // nb, t),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((nb, out_w), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, out_w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
        if ratio:
            return out[:, 0]
        return out[:, 0], out[:, 1]

    return marginal
