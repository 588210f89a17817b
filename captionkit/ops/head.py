"""Fused vocab-head Pallas kernel: matmul + online log-sum-exp + per-row
top-k, without ever materializing the [N, V] logits in HBM.

Why this kernel exists (round-2 profiling, docs/DESIGN.md): in the beam
decode step the vocab tail — fc matmul -> log_softmax -> +scores broadcast
-> layout copies -> lax.top_k over [B, K*V] — was 42% of device time,
dominated by a 19.6ms top_k sort and ~300MB/step of logits round-trips.
The reference runs this tail as separate cuDNN/cuBLAS + thrust sort calls
(SURVEY.md §4.3 ⟦cite: mount empty⟧).

The fusion computes, per [TN, TV] logits tile resident in VMEM:

    logits = h @ W[:, tile] + b[tile]            (MXU, fp32 accum)
    m, s  <- online max / exp-sum (flash-style)  (VPU)
    top-k <- k max/argmin-index passes merged into a running top-k

and writes only [N, k] values+indices and the [N] log-sum-exp. Exact
top-k semantics match lax.top_k (ties -> lowest index) because per-tile
argmax resolves ties to the lowest index and earlier tiles win merges.

Beam search consumes this as: per-row top-K of (logit - lse) is exact for
the global top-K over K*V candidates, since every global winner must be
in its own row's top-K.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile budget under the DEFAULT 16MB per-program scoped-VMEM limit, so
# the kernel compiles inside any user's plain jax.jit. 12MB admits
# (512,1024) at paper scale (~10.5MB estimated), which the round-3
# in-program A/B measured FASTEST once the fp32-index extraction landed:
# 7,894 captions/s vs 7,462 at (512,512) — halving the vocab-tile count
# halves the W re-streams and the cross-tile merges, and the cheaper
# extraction no longer starves MSA the way the round-2 (int-index)
# kernel did at big tiles. (History: round 2 measured big tiles SLOWER
# and pinned (512,512); that result was real but specific to the old
# extraction's VPU pressure.) CAPTIONKIT_HEAD_TILES still overrides.
VMEM_BUDGET = 12 * 1024 * 1024
_NEG = -1e30

# Perf-experiment overrides, read ONCE at import: fused_head_topk is
# jit-cached on shapes/static args, so a post-import env change would be
# silently ignored for already-traced shapes anyway. Parsed defensively:
# a malformed value must not break module import or surface as an opaque
# error deep inside a jitted program.


def _parse_tiles_env(raw: str) -> tuple[int, int] | None:
    if not raw:
        return None
    try:
        tn, tv = (int(t) for t in raw.split(","))
        if tn <= 0 or tv <= 0:
            raise ValueError("tiles must be positive")
        return tn, tv
    except ValueError as e:
        import warnings

        warnings.warn(
            f"CAPTIONKIT_HEAD_TILES={raw!r} is not 'TN,TV' positive ints "
            f"({e}); ignoring the override"
        )
        return None


def _parse_int_env(name: str, default: int) -> int:
    raw = os.environ.get(name, "")
    if not raw:
        return default
    try:
        return int(raw)
    except ValueError:
        import warnings

        warnings.warn(f"{name}={raw!r} is not an int; using {default}")
        return default


_ENV_TILES = _parse_tiles_env(os.environ.get("CAPTIONKIT_HEAD_TILES", ""))
_ENV_SWEEP = bool(os.environ.get("CAPTIONKIT_HEAD_SWEEP", ""))
_ENV_SWEEP_TN = _parse_int_env("CAPTIONKIT_SWEEP_TN", 256)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x: jax.Array, axis: int, target: int, value=0.0) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pick_tiles(N: int, H: int, V: int, k: int, itemsize: int,
                h_itemsize: int | None = None,
                logits_buffers: int = 1):
    """(TN, TV): double-buffered h/w/b blocks + fp32 logits tile + running
    top-k/lse scratch must fit the VMEM budget (at paper scale the budget
    admits (512,512) — see the module-level note: bigger tiles measured
    SLOWER end-to-end once the program-level scoped-VMEM rebalance is in
    effect, and per-kernel VMEM reservations regress the whole program).

    CAPTIONKIT_HEAD_TILES="TN,TV" overrides (perf experiments only;
    read at import time — see _ENV_TILES). The override bypasses the
    budget walk below; if it would blow the default-scoped-VMEM budget a
    warning names the env var, since the eventual failure is an opaque
    Mosaic compile error."""
    if _ENV_TILES is not None:
        tn, tv = _ENV_TILES
        # Same formula as the budget walk below (outs double-buffered,
        # run_m/run_s included, fp32 bias block) — an estimate that
        # undercounts would skip the warning exactly when it matters.
        est = _vmem_cost(tn, tv, H, k, itemsize, h_itemsize,
                         logits_buffers)
        if est > VMEM_BUDGET:
            import warnings

            warnings.warn(
                f"CAPTIONKIT_HEAD_TILES={tn},{tv} needs ~{est >> 20}MB of "
                f"VMEM, over the {VMEM_BUDGET >> 20}MB budget the default "
                "path enforces — expect a Mosaic OOM unless the program "
                "raises its scoped-VMEM limit"
            )
        return min(tn, _round_up(N, 8)), min(tv, _round_up(V, 128))
    for tn, tv in ((1024, 1024), (512, 1024), (512, 512),
                   (256, 512),
                   (256, 256), (128, 256), (128, 128), (64, 128),
                   (32, 128), (16, 128), (8, 128)):
        if _vmem_cost(tn, tv, H, k, itemsize, h_itemsize,
                      logits_buffers) <= VMEM_BUDGET:
            return min(tn, _round_up(N, 8)), min(tv, _round_up(V, 128))
    return 8, 128


def _vmem_cost(tn: int, tv: int, H: int, k: int, itemsize: int,
               h_itemsize: int | None = None,
               logits_buffers: int = 1) -> int:
    """VMEM bytes a (TN, TV) tiling needs: double-buffered h/w/b blocks and
    outputs, fp32 logits tile(s), running top-k + m/s scratch.

    ``h_itemsize`` splits the activation-block width from the weight's —
    the int8 kernel streams int8 WEIGHTS (itemsize=1) but its h blocks
    arrive fp32 and it materializes an int32 accumulator tile next to
    the fp32 logits (``logits_buffers=2``); pricing h at 1 byte there
    would silently erase the budget's safety margin at paper scale."""
    h_blk = tn * H * (h_itemsize if h_itemsize is not None else itemsize)
    w_blk = H * tv * itemsize
    b_blk = tv * 4
    logits = tn * tv * 4 * logits_buffers
    scratch = tn * (2 * _round_up(k, 128) + 2 * 128) * 4
    outs = tn * (2 * _round_up(k, 128) + 128) * 4
    return 2 * (h_blk + w_blk + b_blk + outs) + logits + scratch


_BIGF = 1e9  # sentinel above any fp32-exact index (indices stay < 2^24)


def _rowmax_argmax_f(x, base_iota_f):
    """(max, lowest-index argmax) along axis 1, index arithmetic in fp32 —
    explicit lowest-index tie-break (matches lax.top_k). fp32 rather than
    int32 ON PURPOSE: int32 select/min-reduce lower poorly on the v5e VPU
    (round-3 A/B: the int-index kernel ran 1,387 us/iter vs 1,256 for
    this fp32 twin at paper shapes — the index machinery was 360us of the
    501us extraction cost). Exact: indices ≤ vocab+pad < 2^24. Returns
    (m fp32 [TN], idxf fp32 [TN,TV] masked iota, amf fp32 [TN])."""
    m = jnp.max(x, axis=1)
    idxf = jnp.where(x == m[:, None], base_iota_f, _BIGF)
    return m, idxf, jnp.min(idxf, axis=1)


def _lse_topk_update(logits, k, TV, vals_out, idx_out, lse_out,
                     run_vals, run_idx, run_m, run_s, extract="mask"):
    """Everything downstream of the logits tile, shared by the fp and the
    int8-dequant kernels: online log-sum-exp, k extraction passes over the
    tile, merge into the running top-k, final write on the last tile.

    ``extract`` picks the per-tile top-k algorithm (identical results,
    pinned by the tie tests; different VPU cost):

    - "mask": k passes of (max, lowest-index argmax, rewrite the winner to
      -inf). Each pass streams the tile ~4x including a full-tile WRITE —
      ~20 mixed streams for k=5.
    - "thresh": never rewrites the tile. The extracted prefix after step i
      is exactly the lexicographic (value desc, index asc) head of the
      row, so a (v_prev, i_prev) threshold characterizes the consumed set:
      an element is still active iff v < v_prev OR (v == v_prev AND
      col > i_prev). Step 1's max is the LSE pass's ``tm`` (free); each
      later step is two read-only traversals (thresholded max, then
      eligible lowest-index). ~9 read streams for k=5, zero writes."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_vals[...] = jnp.full_like(run_vals, _NEG)
        run_idx[...] = jnp.zeros_like(run_idx)
        run_m[...] = jnp.full_like(run_m, _NEG)
        run_s[...] = jnp.zeros_like(run_s)

    # -- online log-sum-exp (flash-softmax update) -----------------------
    tm = jnp.max(logits, axis=1, keepdims=True)  # [TN, 1]
    m_old = run_m[...][:, :1]
    m_new = jnp.maximum(m_old, tm)
    s_old = run_s[...][:, :1]
    s_new = s_old * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    run_m[...] = jnp.broadcast_to(m_new, run_m.shape)
    run_s[...] = jnp.broadcast_to(s_new, run_s.shape)

    # -- tile top-k (k max/lowest-index passes, fp32 indices) ------------
    tn = logits.shape[0]
    colf = jax.lax.broadcasted_iota(jnp.int32, (tn, TV), 1).astype(
        jnp.float32
    )
    tile = logits
    t_vals, t_idxf = [], []
    if extract == "thresh":
        v = tm  # [TN, 1] pre-mask tile max, already computed for the LSE
        idxf = jnp.where(tile == v, colf, _BIGF)
        i = jnp.min(idxf, axis=1, keepdims=True)
        t_vals.append(v[:, 0])
        t_idxf.append(i[:, 0] + jnp.float32(j * TV))
        for _ in range(k - 1):
            act = (tile < v) | ((tile == v) & (colf > i))
            cand = jnp.where(act, tile, _NEG)
            v_n = jnp.max(cand, axis=1, keepdims=True)
            # All elements at the new value are eligible if the value
            # strictly dropped; if it repeated (duplicate value spanning
            # extraction steps) eligibility is col > i_prev. (v_n < v) is
            # a per-row scalar, so no full-tile `act` temp here.
            elig = (tile == v_n) & ((v_n < v) | (colf > i))
            idxf = jnp.where(elig, colf, _BIGF)
            i = jnp.min(idxf, axis=1, keepdims=True)
            v = v_n
            t_vals.append(v[:, 0])
            t_idxf.append(i[:, 0] + jnp.float32(j * TV))
    else:
        for _ in range(k):
            m, idxf, amf = _rowmax_argmax_f(tile, colf)
            t_vals.append(m)
            t_idxf.append(amf + jnp.float32(j * TV))
            # idxf == amf picks exactly the winning element (ties in the
            # value resolve through the iota, which is unique per column)
            tile = jnp.where(idxf == amf[:, None], _NEG, tile)

    # -- merge running top-k with tile top-k -----------------------------
    # Order matters for ties: running entries (earlier tiles / lower
    # vocab ids) come first so lowest-index wins.
    cand_vals = jnp.concatenate(
        [run_vals[...][:, :k]] + [v[:, None] for v in t_vals], axis=1
    )  # [TN, 2k]
    cand_idx = jnp.concatenate(
        [run_idx[...][:, :k]] + [i[:, None] for i in t_idxf], axis=1
    )
    posf = jax.lax.broadcasted_iota(
        jnp.int32, cand_vals.shape, 1
    ).astype(jnp.float32)
    new_vals, new_idx = [], []
    for _ in range(k):
        m, pf, amf = _rowmax_argmax_f(cand_vals, posf)
        sel = pf == amf[:, None]
        new_vals.append(m)
        new_idx.append(jnp.sum(jnp.where(sel, cand_idx, 0.0), axis=1))
        cand_vals = jnp.where(sel, _NEG, cand_vals)
    run_vals[...] = jnp.pad(
        jnp.stack(new_vals, axis=1),
        ((0, 0), (0, run_vals.shape[1] - k)),
        constant_values=_NEG,
    )
    run_idx[...] = jnp.pad(
        jnp.stack(new_idx, axis=1),
        ((0, 0), (0, run_idx.shape[1] - k)),
    )

    @pl.when(j == nj - 1)
    def _():
        vals_out[...] = run_vals[...][:, : vals_out.shape[1]]
        idx_out[...] = run_idx[...][:, : idx_out.shape[1]].astype(
            jnp.int32
        )
        m = run_m[...][:, :1]
        s = run_s[...][:, :1]
        lse_out[...] = jnp.broadcast_to(
            m + jnp.log(s), lse_out.shape
        )


def _make_head_kernel(k: int, TV: int, extract: str = "mask"):
    def kernel(h_ref, w_ref, b_ref, vals_out, idx_out, lse_out,
               run_vals, run_idx, run_m, run_s):
        logits = (
            jnp.dot(h_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)
            + b_ref[...]
        )  # [TN, TV] fp32
        _lse_topk_update(logits, k, TV, vals_out, idx_out, lse_out,
                         run_vals, run_idx, run_m, run_s, extract=extract)

    return kernel


def _quantize_rows(hf: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: returns (h_q int8, s_h fp32 [N, 1])."""
    amax = jnp.maximum(jnp.max(jnp.abs(hf), axis=1, keepdims=True), 1e-8)
    s_h = amax / 127.0
    return jnp.round(hf / s_h).astype(jnp.int8), s_h


def _make_head_kernel_int8(k: int, TV: int, extract: str = "mask"):
    """int8 variant: the weight tile arrives pre-quantized (per-column
    symmetric, quantize_head); the activation rows are quantized in-kernel
    (per-row symmetric, recomputed per vocab tile — identical each time,
    so the dequantized logits are tile-order independent). The int8 x
    int8 -> int32 dot rides the MXU's double-rate int8 path on v5e; the
    extraction downstream is the shared fp32 body."""

    def kernel(h_ref, w_ref, s_ref, b_ref, vals_out, idx_out, lse_out,
               run_vals, run_idx, run_m, run_s):
        h_q, s_h = _quantize_rows(h_ref[...].astype(jnp.float32))
        acc = jnp.dot(h_q, w_ref[...], preferred_element_type=jnp.int32)
        logits = acc.astype(jnp.float32) * (s_h * s_ref[...]) + b_ref[...]
        _lse_topk_update(logits, k, TV, vals_out, idx_out, lse_out,
                         run_vals, run_idx, run_m, run_s, extract=extract)

    return kernel


def _make_sweep_kernel(k: int, Vp: int):
    """Single-sweep variant: the whole padded vocab is ONE tile. No
    cross-tile merge, no running log-sum-exp rescale, and the weight
    block's index map is constant so Mosaic loads W exactly once for the
    whole grid (vs once per row-block in the tiled kernel). Needs the
    per-kernel VMEM limit raised (pltpu.CompilerParams.vmem_limit_bytes);
    v5e has 128MB of VMEM and the default 16MB cap strands it."""

    def kernel(h_ref, w_ref, b_ref, vals_out, idx_out, lse_out):
        logits = (
            jnp.dot(h_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)
            + b_ref[...]
        )  # [TN, Vp] fp32
        tn = logits.shape[0]
        m = jnp.max(logits, axis=1, keepdims=True)
        s = jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True)
        lse_out[...] = m + jnp.log(s)

        colf = jax.lax.broadcasted_iota(jnp.int32, (tn, Vp), 1).astype(
            jnp.float32
        )
        tile = logits
        vs, ids = [], []
        for _ in range(k):
            mx, idxf, amf = _rowmax_argmax_f(tile, colf)
            vs.append(mx)
            ids.append(amf)
            tile = jnp.where(idxf == amf[:, None], _NEG, tile)
        vals_out[...] = jnp.stack(vs, axis=1)
        idx_out[...] = jnp.stack(ids, axis=1).astype(jnp.int32)

    return kernel


def _sweep_head_topk(h, w, b, *, k, compute_dtype, interpret):
    N, H = h.shape
    V = w.shape[1]
    dt = compute_dtype
    TN = min(_ENV_SWEEP_TN, _round_up(N, 8))
    Np, Vp = _round_up(N, TN), _round_up(V, 128)
    h_p = _pad_axis(h.astype(dt), 0, Np)
    w_p = _pad_axis(w.astype(dt), 1, Vp)
    b_p = _pad_axis(b.astype(jnp.float32), 0, Vp, value=_NEG).reshape(1, Vp)
    grid = (Np // TN,)
    vals, idx, lse = pl.pallas_call(
        _make_sweep_kernel(k, Vp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # constant: loaded once
            pl.BlockSpec((1, Vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, k), jnp.float32),
            jax.ShapeDtypeStruct((Np, k), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(h_p, w_p, b_p)
    return vals[:N], idx[:N], lse[:N, 0]


def prepad_head(
    w: jax.Array,  # [H, V]
    b: jax.Array,  # [V]
    *,
    n_rows: int,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Pad + convert the head weights to the kernel's tile grid ONCE,
    outside the decode loop.

    fused_head_topk pads its weight operand to a TV multiple on every
    call; inside beam search's while_loop XLA declines to hoist that pad
    (same large-loop-invariant-buffer LICM heuristic that keeps the
    att_zv broadcast in the body — pad.191 in the round-3 profile,
    37us/step of pure HBM churn at paper scale). Callers that decode
    many steps pre-pad here and pass the result straight through:
    fused_head_topk's own _pad_axis/astype become no-ops because the
    tile walk is V-independent, so it re-derives the same (TN, TV).

    Padded vocab columns carry bias -1e30: never in the top-k, and
    exp(-1e30) = 0 keeps the log-sum-exp exact."""
    H, V = w.shape
    dt = compute_dtype
    TN, TV = _pick_tiles(n_rows, H, V, k, jnp.dtype(dt).itemsize)
    TV = min(TV, _round_up(V, 128))
    Vp = _round_up(V, TV)
    w_p = _pad_axis(w.astype(dt), 1, Vp)
    b_p = _pad_axis(b.astype(jnp.float32), 0, Vp, value=_NEG)
    return w_p, b_p


@functools.partial(
    jax.jit,
    static_argnames=("k", "compute_dtype", "interpret", "tiles", "extract"),
)
def fused_head_topk(
    h: jax.Array,  # [N, H] hidden (pre-head)
    w: jax.Array,  # [H, V]
    b: jax.Array,  # [V]
    *,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
    tiles: tuple[int, int] | None = None,
    extract: str = "mask",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (top_vals [N,k] fp32 raw logits, top_idx [N,k] int32,
    lse [N] fp32) — top-k by logit value == top-k by log-prob, since the
    log-sum-exp is a per-row constant. ``extract`` picks the in-kernel
    top-k algorithm (see _lse_topk_update); results are identical."""
    if extract not in ("mask", "thresh"):
        raise ValueError(
            f"extract must be 'mask' or 'thresh', got {extract!r}")
    if _ENV_SWEEP:
        return _sweep_head_topk(h, w, b, k=k, compute_dtype=compute_dtype,
                                interpret=interpret)
    N, H = h.shape
    V = w.shape[1]
    dt = compute_dtype
    TN, TV = tiles or _pick_tiles(N, H, V, k, jnp.dtype(dt).itemsize)
    TN, TV = min(TN, _round_up(N, 8)), min(TV, _round_up(V, 128))
    Np, Vp = _round_up(N, TN), _round_up(V, TV)

    h_p = _pad_axis(h.astype(dt), 0, Np)
    w_p = _pad_axis(w.astype(dt), 1, Vp)
    # Padded vocab columns score -1e30: never in the top-k, exp() = 0.
    b_p = _pad_axis(
        b.astype(jnp.float32), 0, Vp, value=_NEG
    ).reshape(1, Vp)

    kcols = _round_up(k, 128)
    grid = (Np // TN, Vp // TV)
    vals, idx, lse = pl.pallas_call(
        _make_head_kernel(k, TV, extract),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((H, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w
            pl.BlockSpec((1, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b
        ],
        out_specs=[
            pl.BlockSpec((TN, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, k), jnp.float32),
            jax.ShapeDtypeStruct((Np, k), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, kcols), jnp.float32),  # run_vals
            pltpu.VMEM((TN, kcols), jnp.float32),  # run_idx (fp32, exact)
            pltpu.VMEM((TN, 128), jnp.float32),  # run_m
            pltpu.VMEM((TN, 128), jnp.float32),  # run_s
        ],
        interpret=interpret,
    )(h_p, w_p, b_p)
    return vals[:N], idx[:N], lse[:N, 0]


def quantize_head(
    w: jax.Array,  # [H, V]
    b: jax.Array,  # [V]
    *,
    n_rows: int,
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-column symmetric int8 quantization of the vocab head, padded to
    the kernel tile grid (the serving knob ModelConfig.head_quant="int8").

    Done once per decode batch in prepare_topk — the analog of
    prepad_head for the quantized path. Returns (w_q int8 [H, Vp],
    w_scale fp32 [Vp], b fp32 [Vp]). Padded vocab columns carry scale 1 /
    weight 0 / bias -1e30, so they never enter the top-k and contribute
    exp(-1e30) = 0 to the log-sum-exp — same convention as prepad_head.
    """
    H, V = w.shape
    # int8 weights, fp32 h blocks, int32 accumulator + fp32 logits tiles
    # (see _vmem_cost) — MUST match fused_head_topk_int8's walk exactly.
    TN, TV = _pick_tiles(n_rows, H, V, k, 1, h_itemsize=4,
                         logits_buffers=2)
    TV = min(TV, _round_up(V, 128))
    Vp = _round_up(V, TV)
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0  # [V]
    w_q = _pad_axis(jnp.round(wf / scale).astype(jnp.int8), 1, Vp)
    scale_p = _pad_axis(scale, 0, Vp, value=1.0)
    b_p = _pad_axis(b.astype(jnp.float32), 0, Vp, value=_NEG)
    return w_q, scale_p, b_p


@functools.partial(jax.jit, static_argnames=("k", "interpret", "extract"))
def fused_head_topk_int8(
    h: jax.Array,  # [N, H] hidden (pre-head), float
    w_q: jax.Array,  # [H, Vp] int8, pre-quantized+padded (quantize_head)
    w_scale: jax.Array,  # [Vp] fp32 per-column scales
    b: jax.Array,  # [Vp] fp32, padding = -1e30
    *,
    k: int,
    interpret: bool = False,
    extract: str = "mask",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """int8 twin of fused_head_topk: same (vals, idx, lse) contract, with
    logits = (q8(h) @ w_q) * (s_h * s_w) + b. The approximation error is
    the quantization's (per-row + per-column symmetric int8); the
    extraction is exact top-k over those quantized logits — bit-identical
    to xla_head_topk_int8 / reference_head_topk_int8 on the same inputs.

    [PENDING CHIP] Built during the round-3 tunnel outage: interpret-mode
    exact, expected to cut the head's matmul + W-stream cost ~2x on the
    v5e int8 MXU path; no on-chip number yet (DESIGN.md session-5 list).
    """
    if extract not in ("mask", "thresh"):
        raise ValueError(
            f"extract must be 'mask' or 'thresh', got {extract!r}")
    N, H = h.shape
    Vp = w_q.shape[1]
    TN, TV = _pick_tiles(N, H, Vp, k, 1, h_itemsize=4, logits_buffers=2)
    TN = min(TN, _round_up(N, 8))
    TV = min(TV, Vp)
    if Vp % TV:
        raise ValueError(
            f"w_q vocab axis {Vp} is not a multiple of tile {TV}; "
            "quantize with ops.head.quantize_head"
        )
    Np = _round_up(N, TN)
    h_p = _pad_axis(h.astype(jnp.float32), 0, Np)
    s_p = w_scale.astype(jnp.float32).reshape(1, Vp)
    b_p = b.astype(jnp.float32).reshape(1, Vp)

    kcols = _round_up(k, 128)
    grid = (Np // TN, Vp // TV)
    vals, idx, lse = pl.pallas_call(
        _make_head_kernel_int8(k, TV, extract),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((H, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w_q
            pl.BlockSpec((1, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # scales
            pl.BlockSpec((1, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b
        ],
        out_specs=[
            pl.BlockSpec((TN, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, k), jnp.float32),
            jax.ShapeDtypeStruct((Np, k), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN, kcols), jnp.float32),  # run_vals
            pltpu.VMEM((TN, kcols), jnp.float32),  # run_idx (fp32, exact)
            pltpu.VMEM((TN, 128), jnp.float32),  # run_m
            pltpu.VMEM((TN, 128), jnp.float32),  # run_s
        ],
        interpret=interpret,
    )(h_p, w_q, s_p, b_p)
    return vals[:N], idx[:N], lse[:N, 0]


def quantized_head_logits(h, w_q, w_scale, b):
    """Dequantized logits in plain jnp — the single numeric definition the
    Pallas int8 kernel, the XLA int8 path, and the tests all share."""
    h_q, s_h = _quantize_rows(h.astype(jnp.float32))
    acc = jnp.dot(h_q, w_q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_h * w_scale[None, :]) + b


def xla_head_topk_int8(h, w_q, w_scale, b, *, k):
    """Same contract as fused_head_topk_int8 in plain XLA (the
    head_impl="xla" dispatch under head_quant="int8")."""
    logits = quantized_head_logits(h, w_q, w_scale, b)
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    return vals, idx.astype(jnp.int32), lse


def xla_head_topk(
    h: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Same contract as fused_head_topk, in plain XLA: bf16 MXU matmul ->
    fp32 logits -> per-row lax.top_k + logsumexp.

    Round-3 measurements (examples/bench_head_variants.py, paper shapes
    [2560,1024]x[1024,9490] k=5, scan-chained on a v5e): 834us/iter vs
    the Pallas kernel's 1387 in ISOLATION — round 2's "XLA tail = 2.64ms"
    was for the old single-stage formulation (materialized log_softmax +
    top_k over the [B, K*V] concat) and went stale when beam search moved
    to exact per-row top-K. In the FULL beam-decode program, however,
    this path's ~97MB/step logits round-trip crowds the MSA feature
    cache and it LOSES: 6,966-6,974 captions/s vs 7,144 with the kernel
    (measured at both 48MB and default scoped-VMEM). Kept as a
    configurable (ModelConfig.head_impl="xla") — the trade flips when
    context traffic is small or vocab is huge."""
    dt = compute_dtype
    logits = (
        jnp.dot(h.astype(dt), w.astype(dt),
                preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    return vals, idx.astype(jnp.int32), lse


def reference_head_topk(h, w, b, *, k):
    """jnp twin for parity tests: full logits -> top_k + logsumexp."""
    logits = (h.astype(jnp.float32) @ w.astype(jnp.float32) + b).astype(
        jnp.float32
    )
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    return vals, idx.astype(jnp.int32), lse
