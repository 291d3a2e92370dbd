"""Oracle renderer: exact blending semantics in pure jnp, for small scenes.

This module *defines* the blending semantics every production kernel must
match (the reference ships no tests — SURVEY.md §4; this oracle replaces
them). Two implementations:

- `render_oracle`: closed-form "prefix-product" formulation. Front-to-back
  alpha compositing is associative, so per pixel

      w_i = alpha_i * prod_{j<i}(1 - alpha_j) * [prod_{j<=i}(1 - alpha_j) >= 1e-4]
      C   = sum_i w_i c_i + T_final * bg

  which is exactly the sequential reference loop
  (forward.cu:325-373) because transmittance is monotone decreasing, so the
  early-exit test `T*(1-alpha) < 1e-4 -> done` defines a prefix of included
  contributors. This formulation is what the Pallas kernels implement.

- `render_sequential`: a literal lax.scan transcription of the CUDA loop
  (done-flag and all), used in tests to certify the equivalence.

Gating parity with the reference:
  * skip if power > 0 (forward.cu:336)
  * alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255
  * gaussian only touches pixels inside its tile rect (binning semantics)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianmesh_tpu.ops.preprocess import TILE, CameraArrays, Preprocessed, preprocess

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RenderOut(NamedTuple):
    color: jax.Array     # (3, H, W)
    final_t: jax.Array   # (H, W)
    n_contrib: jax.Array # (H, W) int32


def _pixel_alphas(prep: Preprocessed, opacity, order, px, py):
    """alpha (P, M) for P pixels x M depth-ordered Gaussians, with all gates.

    px, py: (P,) pixel centers. order: (M,) gaussian indices, depth-ascending.
    """
    mean2d = prep.mean2d[order]          # (M, 2)
    conic = prep.conic[order]            # (M, 3)
    op = opacity[order]                  # (M,)
    valid = prep.valid[order]
    rmin = prep.rect_min[order]          # (M, 2)
    rmax = prep.rect_max[order]

    dx = mean2d[None, :, 0] - px[:, None]     # (P, M)
    dy = mean2d[None, :, 1] - py[:, None]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a[None] * dx * dx + c[None] * dy * dy) - b[None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[None, :] * jnp.exp(power))

    tx = (px // TILE).astype(jnp.int32)
    ty = (py // TILE).astype(jnp.int32)
    in_rect = ((tx[:, None] >= rmin[None, :, 0]) & (tx[:, None] < rmax[None, :, 0])
               & (ty[:, None] >= rmin[None, :, 1]) & (ty[:, None] < rmax[None, :, 1]))

    candidate = valid[None, :] & in_rect
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN) & candidate
    return jnp.where(gate, alpha, 0.0), candidate


def render_oracle(means3d, cov6, opacity, rgb, cam: CameraArrays,
                  width: int, height: int, bg,
                  pixel_chunk: int = 4096) -> RenderOut:
    """Closed-form oracle. O(H*W*N) memory per chunk — small scenes only."""
    prep = preprocess(means3d, cov6, cam, width, height)
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    colors = rgb[order]                                   # (M, 3)

    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)

    n_pix = pix.shape[0]
    pad = (-n_pix) % pixel_chunk
    pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
    chunks = pix_p.reshape(-1, pixel_chunk, 2)

    def one_chunk(pc):
        alpha, candidate = _pixel_alphas(prep, opacity, order, pc[:, 0], pc[:, 1])
        log_om = jnp.log1p(-alpha)                        # (P, M)
        cum = jnp.cumsum(log_om, axis=1)                  # inclusive
        s_incl = jnp.exp(cum)
        s_excl = jnp.exp(cum - log_om)
        include = s_incl >= T_EPS
        w = alpha * s_excl * include
        color = w @ colors                                # (P, 3)
        final_t = jnp.exp(jnp.sum(jnp.where(include, log_om, 0.0), axis=1))
        # n_contrib mirrors `last_contributor` (forward.cu:328,361): the
        # position, within the pixel's candidate list (its tile's range),
        # of the last gaussian that actually contributed.
        contributes = include & (alpha > 0.0)
        cand_rank = jnp.cumsum(candidate.astype(jnp.int32), axis=1)
        n_contrib = jnp.max(jnp.where(contributes, cand_rank, 0), axis=1)
        color = color + final_t[:, None] * bg[None, :]
        return color, final_t, n_contrib

    color, final_t, n_contrib = jax.lax.map(one_chunk, chunks)
    color = color.reshape(-1, 3)[:n_pix].reshape(height, width, 3)
    final_t = final_t.reshape(-1)[:n_pix].reshape(height, width)
    n_contrib = n_contrib.reshape(-1)[:n_pix].reshape(height, width)
    return RenderOut(color=jnp.transpose(color, (2, 0, 1)), final_t=final_t,
                     n_contrib=n_contrib.astype(jnp.int32))


def render_sequential(means3d, cov6, opacity, rgb, cam: CameraArrays,
                      width: int, height: int, bg) -> RenderOut:
    """Literal lax.scan transcription of renderCUDA's per-pixel loop."""
    prep = preprocess(means3d, cov6, cam, width, height)
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    colors = rgb[order]

    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    px = xs.reshape(-1).astype(jnp.float32)
    py = ys.reshape(-1).astype(jnp.float32)
    alpha, candidate = _pixel_alphas(prep, opacity, order, px, py)  # (P, M)

    def step(carry, inp):
        T, C, done, contrib, last = carry
        a, cand, col = inp
        contrib = contrib + cand.astype(jnp.int32)
        test_t = T * (1.0 - a)
        fire = (~done) & (a > 0.0)
        terminate = fire & (test_t < T_EPS)
        emit = fire & (~terminate)
        C = C + jnp.where(emit, a * T, 0.0)[:, None] * col[None, :]
        T = jnp.where(emit, test_t, T)
        last = jnp.where(emit, contrib, last)
        done = done | terminate
        return (T, C, done, contrib, last), None

    n_pix = px.shape[0]
    init = (jnp.ones(n_pix), jnp.zeros((n_pix, 3)), jnp.zeros(n_pix, bool),
            jnp.zeros(n_pix, jnp.int32), jnp.zeros(n_pix, jnp.int32))
    (T, C, _, _, last), _ = jax.lax.scan(
        step, init, (alpha.T, candidate.T, colors))
    C = C + T[:, None] * bg[None, :]
    return RenderOut(
        color=jnp.transpose(C.reshape(height, width, 3), (2, 0, 1)),
        final_t=T.reshape(height, width),
        n_contrib=last.reshape(height, width),
    )
