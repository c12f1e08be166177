"""The Metropolis-Hastings step kernel: one fused, scanned device program.

Replaces the reference's Python hot loop (sbayes/sampling/mcmc.py:237-328):
each step draws an operator from the schedule (``lax.switch``), proposes a
candidate, recomputes the FULL posterior (fused kernels, no caching), and
accepts/rejects with the MH ratio incl. the Gibbs/reject sentinels and the
MC3 temperature semantics (likelihood heated by 1/T, prior by 1/Tp;
reference: mcmc_chain.py:88,109 and mcmc.py:330-350).

A chain is ``lax.scan`` over steps; chains are a vmapped leading axis.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from sbayes_tpu.sampling.conditionals import Conditionals
from sbayes_tpu.sampling.operators import OperatorSpec
from sbayes_tpu.sampling.state import ChainState


class OperatorStats(NamedTuple):
    """Per-operator accept/reject counters and step sizes (for the
    operator_stats results file; reference: operators.py:221-330)."""

    accepts: jnp.ndarray        # int32 (n_ops,)
    rejects: jnp.ndarray        # int32 (n_ops,)
    step_size_sum: jnp.ndarray  # f32 (n_ops,) summed over accepted steps
    non_finite: jnp.ndarray     # int32 () accepted non-finite posteriors

    @classmethod
    def zeros(cls, n_ops: int) -> "OperatorStats":
        return cls(
            accepts=jnp.zeros(n_ops, jnp.int32),
            rejects=jnp.zeros(n_ops, jnp.int32),
            step_size_sum=jnp.zeros(n_ops, jnp.float32),
            non_finite=jnp.zeros((), jnp.int32),
        )


class Carry(NamedTuple):
    key: jnp.ndarray
    state: ChainState
    stats: OperatorStats


def make_step_fn(cond: Conditionals, op_specs: Sequence[OperatorSpec]) -> Callable:
    """Build the single-MH-step function ``step(carry) -> carry``."""
    post = cond.post
    T, Tp = cond.T, cond.Tp
    op_weights = jnp.asarray([o.weight for o in op_specs], jnp.float32)
    op_logits = jnp.log(op_weights)
    fns = [o.fn for o in op_specs]
    n_ops = len(fns)

    def step(carry: Carry) -> Carry:
        key, state, stats = carry
        key, k_op, k_prop, k_u = jax.random.split(key, 4)

        op_idx = jax.random.categorical(k_op, op_logits)
        res = lax.switch(op_idx, fns, k_prop, state)

        parts = post.parts(res.state)
        ll, lp = parts.log_lh, parts.log_prior
        cand = res.state._replace(log_lh=ll, log_prior=lp)

        gibbs = jnp.isneginf(res.log_q)
        direct_reject = jnp.isneginf(res.log_q_back)
        mh_ratio = (
            (ll - state.log_lh) / T
            + (lp - state.log_prior) / Tp
            - (res.log_q - res.log_q_back)
        )
        u = jnp.log(jax.random.uniform(k_u))
        accept = (~direct_reject) & (gibbs | (u < mh_ratio))

        # Guard: flag accepted non-finite posteriors (reference raises;
        # we count and let the host raise after the chunk).
        nf = accept & (~jnp.isfinite(ll) | ~jnp.isfinite(lp))

        new_state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, state)
        stats = OperatorStats(
            accepts=stats.accepts.at[op_idx].add(accept.astype(jnp.int32)),
            rejects=stats.rejects.at[op_idx].add((~accept).astype(jnp.int32)),
            step_size_sum=stats.step_size_sum.at[op_idx].add(
                jnp.where(accept, res.step_size, 0.0)
            ),
            non_finite=stats.non_finite + nf.astype(jnp.int32),
        )
        return Carry(key, new_state, stats)

    return step


def make_chunk_runner(cond: Conditionals, op_specs: Sequence[OperatorSpec]) -> Callable:
    """``run(key, state, stats, n_steps)`` scanning the step kernel.

    ``n_steps`` is static (one compilation per distinct chunk length).
    """
    step = make_step_fn(cond, op_specs)

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(key, state: ChainState, stats: OperatorStats, n_steps: int):
        def body(carry, _):
            return step(carry), None

        carry, _ = lax.scan(body, Carry(key, state, stats), length=n_steps)
        return carry

    return run


def init_state_posterior(cond: Conditionals, state: ChainState) -> ChainState:
    """Fill in log_lh / log_prior of a freshly built state."""
    parts = jax.jit(cond.post.parts)(state)
    return state._replace(log_lh=parts.log_lh, log_prior=parts.log_prior)
