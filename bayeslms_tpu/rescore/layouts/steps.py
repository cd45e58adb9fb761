"""Jitted device-step installation for BatchScorer.

`install_steps(s)` attaches the jitted entry points every layout module
calls (`s._carry_step`, `s._bucket_step`, `s._packed_step`,
`s._tm_packed_step`, `s._rnn_packed_step`, and — when enabled — the MC
and XL steps). On a mesh, each step wraps its layout impl in a
`jax.shard_map` so every dp shard runs the FULL single-chip compute path
(fused decode+CE, pallas LSTM recurrence, flash attention) on its local
columns; under plain GSPMD in_shardings the opaque pallas calls would
force all-gathers. Chains/batches split as contiguous column blocks.
"""

from __future__ import annotations

import functools

import jax

from . import packed, slotted, xl


def _bind(fn, s):
    """Partial the scorer into a layout impl; jit static_argnums keep the
    same positions as the un-bound tail arguments."""
    return functools.partial(fn, s)


def install_steps(s, mesh):
    if s.rcfg.mc_samples > 0:
        s._mc_step = jax.jit(_bind(slotted.mc_impl, s))
        s._mc_fused_step = jax.jit(_bind(slotted.mc_fused_impl, s))

    if mesh is None:
        s._dp = 1
        s._carry_step = jax.jit(_bind(slotted.carry_chunk_impl, s),
                                static_argnums=(9,))
        s._bucket_step = jax.jit(_bind(slotted.bucket_chunk_impl, s))
        s._packed_step = jax.jit(_bind(packed.packed_carry_impl, s),
                                 static_argnums=(9, 10, 11))
        s._tm_packed_step = jax.jit(_bind(packed.tm_packed_impl, s),
                                    static_argnums=(7,))
        s._rnn_packed_step = jax.jit(_bind(packed.rnn_packed_impl, s),
                                     static_argnums=(7,))
    else:
        from jax.sharding import PartitionSpec as P

        assert "dp" in mesh.axis_names, "scorer mesh needs a 'dp' axis"
        s._dp = mesh.shape["dp"]
        b3 = P(None, None, "dp")  # (n|U, T, B) batches
        h3 = P(None, "dp", None)  # (L, G, H) carries
        # per-shard gather plans: (dp, K) idx/seg + (dp,) n_real
        pk = (P("dp", None), P("dp", None), P("dp"))

        def carry_sharded(params, params2, m2, data, tgt, mask, ce_mask,
                          h1, h2, N, *packs):
            cm_specs = () if ce_mask is None else (b3,)
            cm_args = () if ce_mask is None else (ce_mask,)

            def body(p, p2, m2_, d, t, m, c1, c2, *rest):
                cm = rest[0] if cm_args else None
                pks = rest[len(cm_args):]
                return slotted.carry_chunk_impl(
                    s, p, p2, m2_, d, t, m, cm, c1, c2, N,
                    *(x[0] for x in pks)
                )

            f = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), b3, b3, b3, h3, h3)
                + cm_specs + pk[: len(packs)],
                out_specs=(P(None, "dp"), h3, h3),
                check_vma=False,
            )
            return f(params, params2, m2, data, tgt, mask, h1, h2,
                     *cm_args, *packs)

        def bucket_sharded(params, params2, m2, data, tgt, mask, ce_mask,
                           *packs):
            cm_specs = () if ce_mask is None else (b3,)
            cm_args = () if ce_mask is None else (ce_mask,)

            def body(p, p2, m2_, d, t, m, *rest):
                cm = rest[0] if cm_args else None
                pks = rest[len(cm_args):]
                return slotted.bucket_chunk_impl(
                    s, p, p2, m2_, d, t, m, cm, *(x[0] for x in pks)
                )

            f = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), b3, b3, b3)
                + cm_specs + pk[: len(packs)],
                out_specs=P(None, "dp"),
                check_vma=False,
            )
            return f(params, params2, m2, data, tgt, mask,
                     *cm_args, *packs)

        s._carry_step = jax.jit(carry_sharded, static_argnums=(9,))
        s._bucket_step = jax.jit(bucket_sharded)

        def packed_sharded(params, params2, m2, data, tgt, mask, reset,
                           h1, h2, G_l, N, n_seg_l, idx, seg, n_real):
            """Packed-time carry over a dp mesh: chains split as
            contiguous column blocks (a chain never crosses shards), so
            each shard runs the FULL packed impl — in-kernel resets,
            fused CE — on its local chains with a shard-local gather
            plan. G_l/n_seg_l are PER-SHARD chain/segment counts."""
            b2 = P(None, "dp")   # (T, G*N) packed blocks
            h3_ = P(None, "dp", None)

            def body(p, p2, m2_, d, t, m, r, c1, c2, i_, s_, n_):
                return packed.packed_carry_impl(
                    s, p, p2, m2_, d, t, m, r, c1, c2, G_l, N, n_seg_l,
                    i_[0], s_[0], n_[0])

            f = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), b2, b2, b2, b2, h3_, h3_,
                          P("dp", None), P("dp", None), P("dp")),
                out_specs=(P("dp"), h3_, h3_),
                check_vma=False,
            )
            return f(params, params2, m2, data, tgt, mask, reset,
                     h1, h2, idx, seg, n_real)

        s._packed_step = jax.jit(packed_sharded, static_argnums=(9, 10, 11))

        def tm_packed_sharded(params, params2, m2, data, tgt, segs,
                              positions, n_seg_l, idx, seg, n_real):
            """Sequence-packed TM scoring over a dp mesh: packed columns
            split across shards; each shard runs the full packed impl on
            its local columns with a shard-local gather plan (seg ids are
            per-shard item ranks). n_seg_l is the PER-SHARD (padded)
            segment count."""
            b4 = P(None, None, "dp")  # (n, T, Bc) column blocks

            def body(p, p2, m2_, d, t, sg, pos, i_, s_, n_):
                return packed.tm_packed_impl(
                    s, p, p2, m2_, d, t, sg, pos, n_seg_l,
                    i_[0], s_[0], n_[0])

            f = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), b4, b4, b4, b4,
                          P("dp", None), P("dp", None), P("dp")),
                out_specs=P("dp"),
                check_vma=False,
            )
            return f(params, params2, m2, data, tgt, segs, positions,
                     idx, seg, n_real)

        s._tm_packed_step = jax.jit(tm_packed_sharded, static_argnums=(7,))

        def rnn_packed_sharded(params, params2, m2, data, tgt, mask,
                               reset, n_seg_l, idx, seg, n_real):
            """No-carry packed recurrent scoring over a dp mesh — same
            column sharding as tm_packed_sharded."""
            b4 = P(None, None, "dp")

            def body(p, p2, m2_, d, t, m, r, i_, s_, n_):
                return packed.rnn_packed_impl(
                    s, p, p2, m2_, d, t, m, r, n_seg_l,
                    i_[0], s_[0], n_[0])

            f = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), b4, b4, b4, b4,
                          P("dp", None), P("dp", None), P("dp")),
                out_specs=P("dp"),
                check_vma=False,
            )
            return f(params, params2, m2, data, tgt, mask, reset,
                     idx, seg, n_real)

        s._rnn_packed_step = jax.jit(rnn_packed_sharded, static_argnums=(7,))


def install_xl_steps(s):
    s._xl_mem_step = jax.jit(_bind(xl.xl_mem_impl, s))
    s._xl_score_step = jax.jit(_bind(xl.xl_score_impl, s))
    from . import common

    s._tm_step = jax.jit(_bind(common.tm_scores, s))
