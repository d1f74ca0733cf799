"""A/B: infold payload delivery with lane-friendly TRANSPOSED layout.

Hypothesis: the (.., S|Sq, D=6) payload tensors in block_nn_payload put
D in the minor (lane) dim, which TPU tiles pad toward 128 — the fold's
(Tq, Sq, 6) carry and (T, S, 6) tiles then cost far more HBM traffic
than their nominal bytes (same tax as the documented (N,1) Pallas
output padding). Variant keeps D in the SUBLANE dim throughout:
payload tiles (T, D, S), select einsum "tqs,tds->tdq", carry
(Tq, D, Sq), one transpose at the end.

Usage: python scripts/exp_pltrans.py [N]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import icpx.kernels.blocknn as bnn
from icpx.cloud import PointCloud
from icpx.io.loaders import synthetic_surface
from icpx.registration.icp import ICPConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8388608
K = 3
cfg = ICPConfig()
q_tile = cfg.resolve_q_tile(N)
prec = cfg.resolve_score_prec()
print(f"N={N}  Sq={q_tile}  prec={prec}", flush=True)

xyz = synthetic_surface(N, seed=0)
src = PointCloud.create(xyz, capacity=N)
rng = np.random.default_rng(1)
tgt = PointCloud.create(np.asarray(src.xyz)[rng.permutation(N)], capacity=N)

builder = cfg.tile_builder()
t_idx = jax.jit(
    lambda x, m: bnn.trim_index(
        builder(x, m, tile_size=cfg.block_tile), N, multiple=bnn._SUPER_G)
)(tgt.xyz, tgt.mask)
s_idx = jax.jit(
    lambda x, m: bnn.trim_index(
        builder(x, m, tile_size=q_tile), N, multiple=4)
)(src.xyz, src.mask)
cand = jax.jit(
    lambda q: bnn._candidate_tiles(q, t_idx, cfg.block_k_refine)[0]
)(s_idx.tiles)
t_tiles, s_tiles = t_idx.tiles.shape[0], t_idx.tiles.shape[1]
pl_tiles = jnp.concatenate(
    [t_idx.tiles,
     jnp.ones((t_tiles, s_tiles, 3), jnp.float32)], axis=2)  # (T, S, 6)
pl_tiles_T = pl_tiles.transpose(0, 2, 1)  # (T, 6, S)
jax.block_until_ready((t_idx, s_idx, cand, pl_tiles_T))
_ = float(t_idx.centroids[0, 0])


@partial(jax.jit, static_argnames=("k_tiles", "max_chunk", "score_prec"))
def block_nn_payload_T(
    query_tiles, index, payload_t,  # payload_t: (T, D, S)
    *, k_tiles=8, max_chunk=32768, cand_tiles=None, score_prec="highest",
):
    tq, sq, _ = query_tiles.shape
    d_pl = payload_t.shape[1]
    if tq > max_chunk:
        qt, n_chunks, chunk = bnn._pad_chunks(query_tiles, max_chunk)
        pad_c = qt.shape[0] * qt.shape[1] - tq
        cd = cand_tiles
        if pad_c:
            cd = jnp.concatenate(
                [cd, jnp.zeros((pad_c, cd.shape[1]), cd.dtype)])
        cd = cd.reshape(qt.shape[0], qt.shape[1], -1)
        d, pl = jax.lax.map(
            lambda xs: block_nn_payload_T(
                xs[0], index, payload_t, k_tiles=k_tiles,
                max_chunk=max_chunk, cand_tiles=xs[1],
                score_prec=score_prec),
            (qt, cd),
        )
        n = tq * sq
        return d.reshape(-1)[:n], pl.reshape(-1, d_pl)[:n]
    s = index.tile_size
    if cand_tiles is None:
        cand_tiles, _ = bnn._candidate_tiles(query_tiles, index, k_tiles)
    qc = bnn._tile_center(query_tiles) if score_prec == "bf16" else None
    q_cen = query_tiles - qc[:, None, :] if qc is not None else query_tiles
    q4 = jnp.concatenate(
        [-2.0 * q_cen, jnp.ones((tq, sq, 1), jnp.float32)], axis=2)

    def fold(carry, kk):
        best_s, best_pl, best_valid = carry
        tid = cand_tiles[:, kk]
        r = index.tiles[tid]
        pl = payload_t[tid]  # (Tq, D, S)
        rvalid = jnp.max(jnp.abs(r), axis=2) < 1.0e6
        if qc is not None:
            r = r - qc[:, None, :]
        rr = jnp.sum(r * r, axis=2)
        r4 = jnp.concatenate([r, rr[..., None]], axis=2)
        score = bnn._score_einsum(q4, r4, score_prec)
        score = jnp.where(rvalid[:, None, :], score, jnp.inf)
        smin = jnp.min(score, axis=2)
        lane = jax.lax.broadcasted_iota(jnp.int32, score.shape, 2)
        s_dim = score.shape[2]
        win = jnp.min(
            jnp.where(score <= smin[..., None], lane, s_dim), axis=2)
        onehot = (lane == win[..., None]).astype(jnp.float32)
        cand_pl = jnp.einsum("tqs,tds->tdq", onehot, pl, precision="high")
        cand_ok = jnp.isfinite(smin)
        better = smin < best_s
        return (
            jnp.where(better, smin, best_s),
            jnp.where(better[:, None, :], cand_pl, best_pl),
            jnp.where(better, cand_ok, best_valid),
        ), None

    init = (
        jnp.full((tq, sq), jnp.inf, jnp.float32),
        jnp.zeros((tq, d_pl, sq), jnp.float32),
        jnp.zeros((tq, sq), bool),
    )
    (best_s, best_pl, best_valid), _ = jax.lax.scan(
        fold, init, jnp.arange(cand_tiles.shape[1]), unroll=True)
    qq = jnp.sum(q_cen**2, axis=2)
    d = jnp.maximum(best_s + qq, 0.0)
    d = jnp.where(best_valid, d, jnp.inf)
    return d.reshape(-1), best_pl.transpose(0, 2, 1).reshape(
        tq * sq, d_pl)


def bench(name, make_body, *args):
    @jax.jit
    def run(eps, *a):
        def step(carry, i):
            sc = make_body(carry + i * 1e-7 + eps, *a)
            return carry + sc * 0.0, sc
        total, scalars = jax.lax.scan(
            step, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))
        return scalars.sum()

    v0 = float(run(jnp.float32(0.0), *args))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        v = float(run(jnp.float32((r + 1) * 1e-7), *args))
        ts.append((time.perf_counter() - t0) / K)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms  (chk {v0:.6e})", flush=True)


def cur(eps, qt, cd, tiles, blo, bhi, cent, order, plt):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    d2, pl = bnn.block_nn_payload(qt + eps, idx, plt,
                                  k_tiles=cfg.block_k_refine,
                                  cand_tiles=cd, score_prec=prec)
    return jnp.where(jnp.isfinite(d2), d2, 0.0).sum() * 1e-9 + pl[0, 0]


def trans(eps, qt, cd, tiles, blo, bhi, cent, order, plt_t):
    idx = bnn.TileIndex(tiles=tiles, box_lo=blo, box_hi=bhi,
                        centroids=cent, order=order)
    d2, pl = block_nn_payload_T(qt + eps, idx, plt_t,
                                k_tiles=cfg.block_k_refine,
                                cand_tiles=cd, score_prec=prec)
    return jnp.where(jnp.isfinite(d2), d2, 0.0).sum() * 1e-9 + pl[0, 0]


bench("infold payload (current layout)", cur, s_idx.tiles, cand,
      t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
      t_idx.order, pl_tiles)
bench("infold payload (transposed D-sublane)", trans, s_idx.tiles, cand,
      t_idx.tiles, t_idx.box_lo, t_idx.box_hi, t_idx.centroids,
      t_idx.order, pl_tiles_T)
