# -----------------------------------------------------------------------------
# (The earlier flat-grid kernels that required a MATERIALIZED
# chunk-aligned pair buffer were removed: the sorted-domain kernels
# below subsume them with one fewer HBM-sized gather per step.)

NCONTRIB_ROW = 4


# ---------------------------------------------------------------------------
# Sorted-domain blend v2: half-granular alignment, two tiles per block.
#
# The aligned pair layout exists only so each compute block belongs to
# known tiles; v1 aligned every tile's range to the full 128-lane chunk,
# wasting 44% of lanes at 1080p/100K (avg ~108 pairs/tile). v2 aligns to
# HALF a chunk (64): each 128-lane grid step processes two independent
# 64-lane halves, each owned by (possibly different) tiles — per-lane
# tile origins let both halves share one (PIX, chunk) alpha/gate
# evaluation; only the transmittance scans (which must reset at the
# half boundary) and the color/gradient matmuls split per half. Lane
# waste drops to <= 63 per tile (~25%), and the half-split scans are
# CHEAPER than one full scan (2 x 6 half-width steps vs 7 full).
#
# The feature buffer stays in HBM (memory_space=ANY); the kernel streams
# each half's misaligned sorted-domain window itself with double-buffered
# async DMA (one aligned chunk-wide fetch + a dynamic lane roll), and the
# backward streams the two owning tiles' pixel-gradient rows the same
# way.
#
# (An earlier revision expressed these reads as auto-pipelined views
# with scalar-prefetch-dependent index maps. At 1080p/100K scale,
# repeated in-program invocation of that construct nondeterministically
# ABORTED the TPU backend — isolated to the scalar-index-mapped *input*
# streams by kernel ablation (round-2 log). Manual DMA with in-kernel
# offset computation sidesteps the auto-pipeliner and is the
# load-bearing fix; do not reintroduce scalar-dependent input index
# maps here. Scalar-dependent OUTPUT maps showed no issue, and the two
# per-half outputs below rely on that: a tile's halves alternate between
# the even-half and odd-half output arrays, which are summed after the
# call (rows never visited stay zero via input_output_aliases on zero
# inputs).
#
# The backward walks in reverse with the same reads; its per-block
# gradient writes stay on the ALIGNED domain (disjoint blocks, no
# conflicts) and are mapped back to sorted rows by one inverse gather
# (sorted_shift) — still scatter-free and deterministic. Per-half
# transmittance checkpoints from the forward remove any reverse-sweep
# data dependency.
# ---------------------------------------------------------------------------


def _half_src0(h, half, ht_ref, astarts_ref, starts_ref, m_pad, num_tiles):
    """Sorted-domain start column of aligned half h, clamped so the
    chunk-wide aligned fetch stays in bounds (sentinel halves read pad
    garbage that the live-lane mask zeroes; callers pad the buffer by
    >= 2*half columns past the live range)."""
    tc = jnp.clip(ht_ref[h], 0, num_tiles - 1)
    src0 = starts_ref[tc] + h * half - astarts_ref[tc]
    return jnp.clip(src0, 0, m_pad - 2 * half)


def _half_dma(feat_ref, buf, sem, slot, hi, src0, half):
    """Async copy of the two half-aligned blocks covering the sorted
    window [src0, src0 + half) into (slot, hi) — DMA offsets must
    respect the (8, 128) tiling, so the misaligned extraction happens
    later with one dynamic lane roll (`_half_extract`)."""
    base = (src0 // half) * half
    return pltpu.make_async_copy(
        feat_ref.at[:, pl.ds(pl.multiple_of(base, half), 2 * half)],
        buf.at[slot, hi], sem.at[slot, hi])


def _half_extract(buf, slot, hi, src0, half):
    """(FEAT, half) misaligned window from the fetched aligned pair."""
    off = jax.lax.rem(src0, half)
    shifted = pltpu.roll(buf[slot, hi], 2 * half - off, axis=1)
    return shifted[:, :half]


def _lane_mix(half, chunk, a_val, b_val, dtype=jnp.float32):
    """(1, chunk) per-lane vector: a_val on the first half's lanes,
    b_val on the second's (scalars broadcast)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    return jnp.where(lane < half, jnp.asarray(a_val, dtype),
                     jnp.asarray(b_val, dtype))


def _alphas_mxu_lanes(feat, ox, oy):
    """Gated alphas with PER-LANE tile origins ox/oy (1, chunk) pixels.

    Same bilinear MXU form as `_alphas_mxu` but each lane's mean is
    shifted by its own tile origin, so one (PIX, chunk) evaluation
    serves lanes belonging to different tiles.
    """
    x = feat[ROW_X][None, :] - ox                       # (1, chunk)
    y = feat[ROW_Y][None, :] - oy
    ca = feat[ROW_CA][None, :]
    cb = feat[ROW_CB][None, :]
    cc = feat[ROW_CC][None, :]
    q0 = -0.5 * (ca * x * x + cc * y * y) - cb * x * y
    q1 = ca * x + cb * y
    q2 = cb * x + cc * y
    zero = jnp.zeros_like(x)
    q = jnp.concatenate([q0, q1, q2, -0.5 * ca, -cb, -0.5 * cc, zero, zero])
    power = jax.lax.dot_general(
        _pix_basis(), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (PIX, chunk)
    op = feat[ROW_OP][None, :]
    e = jnp.exp(power)
    raw = op * e
    alpha = jnp.minimum(ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return alpha, gate, raw, x, y


def _make_sorted_fwd_kernel(grid_x: int, chunk: int, num_tiles: int,
                            m_pad: int, with_contrib: bool):
    half = chunk // 2

    def kernel(ht_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               zA_ref, zB_ref, outA_ref, outB_ref, ckpt_ref, carry, buf,
               sem):
        b = pl.program_id(0)
        pb = pl.num_programs(0)
        h0 = 2 * b
        t0 = ht_ref[h0]
        t1 = ht_ref[h0 + 1]
        prev_t = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 1, 0)], -1)
        prev_even = jnp.where(b > 0, ht_ref[jnp.maximum(h0 - 2, 0)], -1)
        next_t = ht_ref[h0 + 2]

        def src0_of(h):
            return _half_src0(h, half, ht_ref, astarts_ref, starts_ref,
                              m_pad, num_tiles)

        # double-buffered stream: every half fetches unconditionally
        # (sentinels read clamped pad — uniform traffic keeps semaphore
        # bookkeeping trivial: exactly one start + one wait per half)
        @pl.when(b == 0)
        def _prologue():
            _half_dma(feat_ref, buf, sem, 0, 0, src0_of(0), half).start()
            _half_dma(feat_ref, buf, sem, 0, 1, src0_of(1), half).start()

        @pl.when(b + 1 < pb)
        def _prefetch():
            nslot = (b + 1) % 2
            _half_dma(feat_ref, buf, sem, nslot, 0, src0_of(h0 + 2),
                      half).start()
            _half_dma(feat_ref, buf, sem, nslot, 1, src0_of(h0 + 3),
                      half).start()

        slot = b % 2
        _half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).wait()
        _half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0 + 1), half).wait()

        # first visit of each output row: zero it (rows never visited
        # keep the aliased zero input)
        @pl.when((t0 != prev_even) & (t0 < num_tiles))
        def _initA():
            outA_ref[...] = jnp.zeros_like(outA_ref)

        @pl.when((t1 != prev_t) & (t1 < num_tiles))
        def _initB():
            outB_ref[...] = jnp.zeros_like(outB_ref)

        # ---- combined per-lane evaluation over both halves ----
        t0c = jnp.clip(t0, 0, num_tiles - 1)
        t1c = jnp.clip(t1, 0, num_tiles - 1)
        featw = jnp.concatenate(
            [_half_extract(buf, slot, 0, src0_of(h0), half),
             _half_extract(buf, slot, 1, src0_of(h0 + 1), half)], axis=1)
        ox = _lane_mix(half, chunk, (t0c % grid_x) * TILE,
                       (t1c % grid_x) * TILE)
        oy = _lane_mix(half, chunk, (t0c // grid_x) * TILE,
                       (t1c // grid_x) * TILE)
        alpha, gate, _, _, _ = _alphas_mxu_lanes(featw, ox, oy)
        # live lanes: position within the owning tile's clamped count
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        rem0 = counts_ref[t0c] - (h0 * half - astarts_ref[t0c])
        rem1 = counts_ref[t1c] - ((h0 + 1) * half - astarts_ref[t1c])
        pos = jnp.where(lane < half, lane, lane - half)
        live = (pos < _lane_mix(half, chunk, rem0, rem1, jnp.int32)
                ) & _lane_mix(half, chunk, t0 < num_tiles, t1 < num_tiles,
                              jnp.bool_)
        alpha = jnp.where(gate & live, alpha, 0.0)

        # ---- per-half transmittance chains ----
        s_prev = carry[0, :]
        sA_in = jnp.where(t0 != prev_t, jnp.ones_like(s_prev), s_prev)
        ckpt_ref[0, 0, :] = sA_in

        omA = 1.0 - alpha[:, :half]
        cumA = _cumprod_lanes(omA)
        sA = sA_in[:, None] * cumA
        inclA = sA >= T_EPS
        wA = alpha[:, :half] * (sA_in[:, None] * _shift_one_lane(cumA, 1.0)
                                ) * inclA
        sA_end = sA[:, half - 1]

        sB_in = jnp.where(t1 != t0, jnp.ones_like(sA_end), sA_end)
        ckpt_ref[0, 1, :] = sB_in

        omB = 1.0 - alpha[:, half:]
        cumB = _cumprod_lanes(omB)
        sB = sB_in[:, None] * cumB
        inclB = sB >= T_EPS
        wB = alpha[:, half:] * (sB_in[:, None] * _shift_one_lane(cumB, 1.0)
                                ) * inclB
        carry[0, :] = sB[:, half - 1]

        # ---- per-half color accumulation ----
        @pl.when(t0 < num_tiles)
        def _accumA():
            colors = jax.lax.dot_general(
                featw[ROW_R:ROW_B + 1, :half], wA, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (3, PIX)
            outA_ref[0, 0:3, :] += colors

        @pl.when(t1 < num_tiles)
        def _accumB():
            colors = jax.lax.dot_general(
                featw[ROW_R:ROW_B + 1, half:], wB, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            outB_ref[0, 0:3, :] += colors

        # ---- final_t / n_contrib bookkeeping ----
        ftA_reset = jnp.where(t0 != prev_t, jnp.ones_like(s_prev),
                              carry[1, :])
        ftA = ftA_reset * jnp.min(jnp.where(inclA, cumA, 1.0), axis=1)
        if with_contrib:
            ncA_reset = jnp.where(t0 != prev_t, jnp.zeros_like(s_prev),
                                  carry[2, :])
            rankA = (pos[:, :half] + (h0 * half - astarts_ref[t0c])
                     + 1).astype(jnp.float32)
            ncA = jnp.maximum(ncA_reset, jnp.max(
                jnp.where(inclA & (alpha[:, :half] > 0.0), rankA, 0.0),
                axis=1))
        else:
            ncA = jnp.zeros_like(s_prev)

        @pl.when((t1 != t0) & (t0 < num_tiles))
        def _closeA():
            outA_ref[0, 3, :] = ftA
            outA_ref[0, NCONTRIB_ROW, :] = ncA

        ftB_reset = jnp.where(t1 != t0, jnp.ones_like(s_prev), ftA)
        ftB = ftB_reset * jnp.min(jnp.where(inclB, cumB, 1.0), axis=1)
        carry[1, :] = ftB
        if with_contrib:
            ncB_reset = jnp.where(t1 != t0, jnp.zeros_like(s_prev), ncA)
            rankB = (pos[:, half:] + ((h0 + 1) * half - astarts_ref[t1c])
                     + 1).astype(jnp.float32)
            ncB = jnp.maximum(ncB_reset, jnp.max(
                jnp.where(inclB & (alpha[:, half:] > 0.0), rankB, 0.0),
                axis=1))
        else:
            ncB = jnp.zeros_like(s_prev)
        carry[2, :] = ncB

        @pl.when((next_t != t1) & (t1 < num_tiles))
        def _closeB():
            outB_ref[0, 3, :] = ftB
            outB_ref[0, NCONTRIB_ROW, :] = ncB

    return kernel


def _make_sorted_bwd_kernel(grid_x: int, chunk: int, num_tiles: int,
                            m_pad: int):
    half = chunk // 2

    def kernel(ht_ref, astarts_ref, counts_ref, starts_ref, feat_ref,
               g_hbm_ref, ckpt_ref, dpart_ref, qcarry, buf, sem, gbuf,
               gsem):
        pb = pl.num_programs(0)
        b = pb - 1 - pl.program_id(0)                  # reverse walk
        h0 = 2 * b
        t0 = ht_ref[h0]
        t1 = ht_ref[h0 + 1]
        later_t = ht_ref[h0 + 2]
        t0c = jnp.clip(t0, 0, num_tiles - 1)
        t1c = jnp.clip(t1, 0, num_tiles - 1)

        def src0_of(h):
            return _half_src0(h, half, ht_ref, astarts_ref, starts_ref,
                              m_pad, num_tiles)

        def g_dma(slot, hi, h):
            tc = jnp.clip(ht_ref[h], 0, num_tiles - 1)
            return pltpu.make_async_copy(
                g_hbm_ref.at[tc], gbuf.at[slot, hi], gsem.at[slot, hi])

        # reverse-order double-buffered streams (feat windows + g rows)
        slot = b % 2
        @pl.when(b == pb - 1)
        def _prologue():
            _half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).start()
            _half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0 + 1),
                      half).start()
            g_dma(slot, 0, h0).start()
            g_dma(slot, 1, h0 + 1).start()

        @pl.when(b > 0)
        def _prefetch():
            nslot = (b - 1) % 2
            _half_dma(feat_ref, buf, sem, nslot, 0, src0_of(h0 - 2),
                      half).start()
            _half_dma(feat_ref, buf, sem, nslot, 1, src0_of(h0 - 1),
                      half).start()
            g_dma(nslot, 0, h0 - 2).start()
            g_dma(nslot, 1, h0 - 1).start()

        _half_dma(feat_ref, buf, sem, slot, 0, src0_of(h0), half).wait()
        _half_dma(feat_ref, buf, sem, slot, 1, src0_of(h0 + 1), half).wait()
        g_dma(slot, 0, h0).wait()
        g_dma(slot, 1, h0 + 1).wait()

        # ---- combined alpha evaluation (identical to forward) ----
        featw = jnp.concatenate(
            [_half_extract(buf, slot, 0, src0_of(h0), half),
             _half_extract(buf, slot, 1, src0_of(h0 + 1), half)], axis=1)
        ox = _lane_mix(half, chunk, (t0c % grid_x) * TILE,
                       (t1c % grid_x) * TILE)
        oy = _lane_mix(half, chunk, (t0c // grid_x) * TILE,
                       (t1c // grid_x) * TILE)
        alpha, gate, raw, x, y = _alphas_mxu_lanes(featw, ox, oy)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        rem0 = counts_ref[t0c] - (h0 * half - astarts_ref[t0c])
        rem1 = counts_ref[t1c] - ((h0 + 1) * half - astarts_ref[t1c])
        pos = jnp.where(lane < half, lane, lane - half)
        live = (pos < _lane_mix(half, chunk, rem0, rem1, jnp.int32)
                ) & _lane_mix(half, chunk, t0 < num_tiles, t1 < num_tiles,
                              jnp.bool_)
        live = live & gate & (raw <= ALPHA_MAX)
        alpha = jnp.where(live, alpha, 0.0)

        basis = _pix_basis()                              # (PIX, 8)

        def half_grads(g_ref, alpha_h, s_in, rgb_h):
            """Within-half gradient core. Returns (dldw-weighted pieces).

            g_ref rows: 0..2 dL/dcolor, 3 g_final_t, 4 final_t.
            """
            om = 1.0 - alpha_h
            cum = _cumprod_lanes(om)
            s = s_in[:, None] * cum
            incl = s >= T_EPS
            s_excl = s_in[:, None] * _shift_one_lane(cum, 1.0)
            w = alpha_h * s_excl * incl

            g3 = jnp.transpose(g_ref[0:3, :])             # (PIX, 3)
            g8 = jnp.concatenate(
                [g3, jnp.zeros((PIX, _QDIM - 3), jnp.float32)], axis=1)
            rgb8 = jnp.concatenate(
                [rgb_h, jnp.zeros((_QDIM - 3, half), jnp.float32)], axis=0)
            dldw = jax.lax.dot_general(
                g8, rgb8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (PIX, half)
            a_mat = dldw * w
            chunk_sum = jnp.sum(a_mat, axis=1)
            suffix = chunk_sum[:, None] - _cumsum_lanes(a_mat)
            return w, om, incl, dldw, g8, chunk_sum, suffix

        # ---- half B first (reverse order within the block) ----
        @pl.when((t1 < num_tiles) & (t1 != later_t))
        def _initB():
            gB = gbuf[slot, 1]
            qcarry[0, :] = gB[3, :] * gB[NCONTRIB_ROW, :]

        sB_in = ckpt_ref[0, 1, :]
        wB, omB, inclB, dldwB, g8B, sumB, sufB = half_grads(
            gbuf.at[slot, 1], alpha[:, half:], sB_in,
            featw[ROW_R:ROW_B + 1, half:])
        qB = qcarry[0, :][:, None] + sufB
        dalphaB = (dldwB * (sB_in[:, None] * _shift_one_lane(
            _cumprod_lanes(omB), 1.0)) - qB / omB) * inclB

        @pl.when(t1 == t0)
        def _carryB():
            qcarry[0, :] += sumB

        @pl.when((t0 < num_tiles) & (t0 != t1))
        def _initA():
            gA = gbuf[slot, 0]
            qcarry[0, :] = gA[3, :] * gA[NCONTRIB_ROW, :]

        sA_in = ckpt_ref[0, 0, :]
        wA, omA, inclA, dldwA, g8A, sumA, sufA = half_grads(
            gbuf.at[slot, 0], alpha[:, :half], sA_in,
            featw[ROW_R:ROW_B + 1, :half])
        qA = qcarry[0, :][:, None] + sufA
        dalphaA = (dldwA * (sA_in[:, None] * _shift_one_lane(
            _cumprod_lanes(omA), 1.0)) - qA / omA) * inclA
        qcarry[0, :] += sumA

        # ---- assemble per-lane gradient rows for the whole block ----
        dalpha = jnp.concatenate([dalphaA, dalphaB], axis=1)
        dalpha = jnp.where(live, dalpha, 0.0)
        dpower = dalpha * alpha

        # All nine per-splat reductions over the PIX pixels ride the MXU:
        # moments of dpower against the pixel monomial basis (tile-local
        # coords, same basis as the forward form) plus the color-gradient
        # contraction against w. The dx/dy polynomials are then recovered
        # per lane from the moments:
        #   sum_p dpower dx      = x R0 - R1   (dx = x - px)
        #   sum_p dpower dx^2    = x^2 R0 - 2 x R1 + R3 , etc.
        # d_op = sum dalpha e = sum dpower / op (alpha = op e on every
        # live lane; both masks zero the rest).
        mom = jax.lax.dot_general(
            basis, dpower, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (8, chunk)
        w_all = jnp.concatenate([wA, wB], axis=1)
        cwA = jax.lax.dot_general(
            g8A, wA, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (8, half)
        cwB = jax.lax.dot_general(
            g8B, wB, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cw = jnp.concatenate([cwA, cwB], axis=1)          # (8, chunk)
        del w_all
        ca, cb, cc = featw[ROW_CA], featw[ROW_CB], featw[ROW_CC]
        r0, r1, r2, r3, r4, r5 = (mom[0], mom[1], mom[2], mom[3],
                                  mom[4], mom[5])
        xl = x[0]
        yl = y[0]
        sdx = xl * r0 - r1
        sdy = yl * r0 - r2
        op_safe = jnp.maximum(featw[ROW_OP], 1e-12)
        zero = jnp.zeros((chunk,), jnp.float32)
        dpart_ref[...] = jnp.stack([
            -(ca * sdx + cb * sdy),
            -(cc * sdy + cb * sdx),
            -0.5 * (xl * xl * r0 - 2.0 * xl * r1 + r3),
            -(xl * yl * r0 - xl * r2 - yl * r1 + r4),
            -0.5 * (yl * yl * r0 - 2.0 * yl * r2 + r5),
            r0 / op_safe,
            cw[0], cw[1], cw[2],
            zero, zero, zero, zero, zero, zero, zero,
        ])

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def blend_sorted_pallas(feat_sortedT: jax.Array, block_tile: jax.Array,
                        aligned_starts: jax.Array, starts: jax.Array,
                        counts: jax.Array, sorted_shift: jax.Array,
                        grid_x: int, num_tiles: int, p_cap: int,
                        chunk: int = 128, with_contrib: bool = False):
    """Flat-grid ragged blend over the SORTED pair buffer.

    feat_sortedT: (FEAT, m_pad) sorted, tile-grouped, depth-ordered pair
        features, padded by at least 2*chunk columns past the live range
        (padding may be garbage — it is never unmasked).
    block_tile: (p_cap // (chunk // 2) + 1,) owning tile per aligned
        HALF-chunk (64-lane granule); num_tiles = sentinel.
    aligned_starts / counts: half-aligned layout bookkeeping.
    starts: (num_tiles + 1,) sorted-domain tile ranges.
    sorted_shift: sorted position -> aligned offset (backward map).
    Returns (color (T, 3, PIX), final_t (T, PIX), n_contrib (T, PIX)).
    """
    out, _ = _sorted_fwd_impl(feat_sortedT, block_tile, aligned_starts,
                              starts, counts, grid_x, num_tiles, p_cap,
                              chunk, with_contrib)
    return out


def _sorted_fwd_impl(feat_sortedT, block_tile, aligned_starts, starts,
                     counts, grid_x, num_tiles, p_cap, chunk,
                     with_contrib=False):
    f_rows, m_pad = feat_sortedT.shape
    assert f_rows == FEAT and m_pad % chunk == 0, (f_rows, m_pad, chunk)
    pb = p_cap // chunk
    half = chunk // 2
    kernel = _make_sorted_fwd_kernel(grid_x, chunk, num_tiles, m_pad,
                                     with_contrib)

    def out_spec(parity):
        return pl.BlockSpec(
            (1, 8, PIX),
            lambda b, ht, *s: (jnp.minimum(ht[2 * b + parity],
                                           num_tiles - 1), 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(
            out_spec(0),
            out_spec(1),
            pl.BlockSpec((1, 2, PIX), lambda b, *s: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, 2, FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    zeros_out = jnp.zeros((num_tiles, 8, PIX), jnp.float32)
    outA, outB, ckpt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((pb, 2, PIX), jnp.float32),
        ),
        input_output_aliases={5: 0, 6: 1},
    )(block_tile.astype(jnp.int32), aligned_starts.astype(jnp.int32),
      counts.astype(jnp.int32), starts.astype(jnp.int32), feat_sortedT,
      zeros_out, zeros_out)
    out8 = outA + outB

    has = counts > 0
    color = jnp.where(has[:, None, None], out8[:, 0:3], 0.0)
    final_t = jnp.where(has[:, None], out8[:, 3], 1.0)
    n_contrib = jnp.where(has[:, None], out8[:, NCONTRIB_ROW], 0.0)
    return (color, final_t, n_contrib), ckpt


def _sorted_fwd_rule(feat_sortedT, block_tile, aligned_starts, starts,
                     counts, sorted_shift, grid_x, num_tiles, p_cap, chunk,
                     with_contrib=False):
    out, ckpt = _sorted_fwd_impl(feat_sortedT, block_tile, aligned_starts,
                                 starts, counts, grid_x, num_tiles, p_cap,
                                 chunk, with_contrib)
    _, final_t, _ = out
    return out, (feat_sortedT, block_tile, aligned_starts, starts, counts,
                 sorted_shift, ckpt, final_t)


def _sorted_bwd_rule(grid_x, num_tiles, p_cap, chunk, with_contrib, res, cts):
    (feat_sortedT, block_tile, aligned_starts, starts, counts, sorted_shift,
     ckpt, final_t) = res
    g_color, g_final_t, _ = cts
    f_rows, m_pad = feat_sortedT.shape
    pb = p_cap // chunk

    zeros = jnp.zeros_like(final_t)
    g8 = jnp.stack([g_color[:, 0], g_color[:, 1], g_color[:, 2],
                    g_final_t, final_t, zeros, zeros, zeros], axis=1)
    kernel = _make_sorted_bwd_kernel(grid_x, chunk, num_tiles, m_pad)

    def rev(b, *s):
        return (0, pl.num_programs(0) - 1 - b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # feat (streamed by DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # g8 (streamed by DMA)
            pl.BlockSpec((1, 2, PIX), lambda b, *s: (pl.num_programs(0) - 1 - b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((FEAT, chunk), rev),
        scratch_shapes=[
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((2, 2, FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, 2, 8, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    dpartT = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, p_cap), jnp.float32),
    )(block_tile.astype(jnp.int32), aligned_starts.astype(jnp.int32),
      counts.astype(jnp.int32), starts.astype(jnp.int32), feat_sortedT,
      g8, ckpt)

    # aligned -> sorted: deterministic inverse gather (each live sorted
    # row has a unique aligned position); padding columns get zero
    m = sorted_shift.shape[0]
    dpart = dpartT.T                                     # (p_cap, FEAT)
    d_pad = jnp.concatenate([dpart, jnp.zeros_like(dpart[:1])])
    p_idx = jnp.arange(m, dtype=jnp.int32)
    dest = jnp.clip(p_idx + sorted_shift, 0, p_cap)
    d_sorted = d_pad[dest]                               # (m, FEAT)
    d_featT = jnp.zeros((f_rows, m_pad), dpart.dtype).at[:, :m].set(
        d_sorted.T)
    return (d_featT, None, None, None, None, None)


blend_sorted_pallas.defvjp(_sorted_fwd_rule, _sorted_bwd_rule)
