"""Batch-vectorized accumulation for rectangle zones.

The per-pair kernel costs ~50µs of Python/numpy dispatch even for a
10x10 window.  For axis-aligned rectangle zones (the dominant shape in
tiling workloads) with scalar/minmax stats, the whole (zone x tile)
batch collapses into flat numpy streams:

  - coverage is separable and closed-form per cell:
      cov = clip(min(bx1,c+1)-max(bx0,c),0,1) * clip(... y ...)
    evaluated on a flat (pair_id, row, col) cell stream built with
    np.repeat / integer arithmetic — no per-pair Python at all;
  - per-pair sums   -> np.bincount(pair_id, weights=...)
  - per-pair min/max + first-seen cell -> np.minimum/maximum.reduceat
    over segment starts (+/-inf padding outside the used mask), with
    the reference's tie rule (lowest cell_id, raster_stats.h:299-311)
    recovered by a second reduceat over candidate cell ids.

Eligibility (else the general per-pair kernel runs): rectangle zone,
no histogram/stored-cells requirement, coverage_weight in
(fraction, none).  Coverage goes through float32 like the per-pair
path (raster_cell_intersection.h:64), so results are identical.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rect_batch_eligible", "accumulate_rect_batch", "CHUNK_CELLS"]

import os

CHUNK_CELLS = int(os.environ.get("EXACTEXTRACT_FAST_CHUNK", "400000"))
# Windows larger than FAST_MAX_CELLS stay on the per-pair path.
# Measured on this box (BENCH/scaling job, 1600-cell windows): the flat
# stream is ~2x SLOWER than the per-pair kernel — the stacked-buffer
# gather turns cache-resident window slices into main-memory traffic —
# and on the sf0.1 bench (150-cell windows) the difference is inside
# the fixed-cost noise.  Default 0 therefore DISABLES the flat path;
# it remains available (set EXACTEXTRACT_FAST_MAX_CELLS) for workloads
# with very small windows at extreme pair counts, and stays covered by
# an equality test.
FAST_MAX_CELLS = int(os.environ.get("EXACTEXTRACT_FAST_MAX_CELLS", "0"))


def rect_batch_eligible(keygroups) -> bool:
    for key, req, _ in keygroups:
        if req.histogram or req.cells:
            return False
        if key[3] not in ("fraction", "none"):  # coverage_weight
            return False
    return True


def accumulate_rect_batch(pairs: list, tiles: dict, key_specs, *,
                          has_weights: bool, out_rows: list,
                          grid_ncols: int, grid_xmin: float, grid_ymax: float,
                          dx: float, dy: float, tile_size: int):
    """pairs: list of (zone_id, tile_j, r0, r1, c0, c1, bbox, row0, col0,
    nodata, w_nodata); tiles: j -> (vals 2-D, wvals 2-D or None).
    Appends partial-row dicts to out_rows."""
    if not pairs:
        return
    P = len(pairs)
    heights = np.array([p[3] - p[2] for p in pairs], dtype=np.int64)
    widths = np.array([p[5] - p[4] for p in pairs], dtype=np.int64)
    areas = heights * widths

    # stack decoded tiles once (padded to tile_size^2)
    idx_of = {}
    stack = []
    wstack = [] if has_weights else None
    for p in pairs:
        j = p[1]
        if j not in idx_of:
            idx_of[j] = len(stack)
            v, w = tiles[j]
            pad = np.full((tile_size, tile_size), np.nan)
            pad[:v.shape[0], :v.shape[1]] = v
            stack.append(pad.ravel())
            if has_weights:
                wpad = np.full((tile_size, tile_size), np.nan)
                if w is not None:
                    wpad[:w.shape[0], :w.shape[1]] = w
                wstack.append(wpad.ravel())
    flat_vals = np.concatenate(stack) if stack else np.empty(0)
    flat_w = np.concatenate(wstack) if has_weights and wstack else None

    tile_idx = np.array([idx_of[p[1]] for p in pairs], dtype=np.int64)
    r0 = np.array([p[2] for p in pairs], dtype=np.int64)
    c0 = np.array([p[4] for p in pairs], dtype=np.int64)
    row0g = np.array([p[7] for p in pairs], dtype=np.int64)
    col0g = np.array([p[8] for p in pairs], dtype=np.int64)
    bx0 = np.array([p[6][0] for p in pairs])
    by0 = np.array([p[6][1] for p in pairs])
    bx1 = np.array([p[6][2] for p in pairs])
    by1 = np.array([p[6][3] for p in pairs])
    nodata = np.array([np.nan if p[9] is None else p[9] for p in pairs])
    w_nodata = np.array([np.nan if p[10] is None else p[10] for p in pairs])

    # chunk pairs so the flat stream stays bounded
    order = np.arange(P)
    cum = np.cumsum(areas)
    chunk_edges = [0]
    target = CHUNK_CELLS
    for i in range(P):
        if cum[i] > target:
            chunk_edges.append(i + 1)
            target = cum[i] + CHUNK_CELLS
    if chunk_edges[-1] != P:
        chunk_edges.append(P)

    for lo, hi in zip(chunk_edges[:-1], chunk_edges[1:]):
        sel = order[lo:hi]
        _chunk(sel, areas, widths, tile_idx, r0, c0, row0g, col0g,
               bx0, by0, bx1, by1, nodata, w_nodata,
               flat_vals, flat_w, pairs, key_specs, has_weights, out_rows,
               grid_ncols, grid_xmin, grid_ymax, dx, dy, tile_size)


def _chunk(sel, areas, widths, tile_idx, r0, c0, row0g, col0g,
           bx0, by0, bx1, by1, nodata, w_nodata,
           flat_vals, flat_w, pairs, key_specs, has_weights, out_rows,
           grid_ncols, grid_xmin, grid_ymax, dx, dy, tile_size):
    a = areas[sel]
    n_cells = int(a.sum())
    if n_cells == 0:
        return
    pcount = sel.size
    pid = np.repeat(np.arange(pcount), a)
    starts = np.cumsum(a) - a
    ordn = np.arange(n_cells) - np.repeat(starts, a)
    w_ = widths[sel][pid]
    rr = r0[sel][pid] + ordn // w_          # tile-local row
    cc = c0[sel][pid] + ordn % w_           # tile-local col
    gr = row0g[sel][pid] + rr               # global row
    gc = col0g[sel][pid] + cc               # global col

    # closed-form rectangle coverage per cell (grid units; dx/dy scaled)
    x_lo = grid_xmin + gc * dx
    y_hi = grid_ymax - gr * dy
    covx = np.clip((np.minimum(bx1[sel][pid], x_lo + dx) -
                    np.maximum(bx0[sel][pid], x_lo)) / dx, 0.0, 1.0)
    covy = np.clip((np.minimum(by1[sel][pid], y_hi) -
                    np.maximum(by0[sel][pid], y_hi - dy)) / dy, 0.0, 1.0)
    cov = (covx * covy).astype(np.float32)  # float32 like the kernel

    flat_ix = tile_idx[sel][pid] * (tile_size * tile_size) + rr * tile_size + cc
    v = flat_vals[flat_ix]
    nd = nodata[sel][pid]

    cell_id = gr * grid_ncols + gc
    P_all = pcount

    for i, req, _vname, kwargs in key_specs:
        min_cov = np.float32(kwargs["min_coverage_frac"])
        cw = kwargs["coverage_weight"]
        dv = kwargs["default_value"]
        dw = kwargs["default_weight"]

        s = cov >= min_cov
        defined = ~np.isnan(v) & (v != nd)
        if dv is not None:
            vals = np.where(defined, v, dv)
            used = s
        else:
            vals = v
            used = s & defined
        c64 = np.ones(n_cells) if cw == "none" else cov.astype(np.float64)

        upid = pid[used]
        n_per = np.bincount(upid, minlength=P_all)
        active = n_per > 0
        if not active.any():
            continue
        cu = c64[used]
        vu = vals[used]
        sum_c = np.bincount(upid, weights=cu, minlength=P_all)
        sum_cx = np.bincount(upid, weights=vu * cu, minlength=P_all)
        sum_cx2 = np.bincount(upid, weights=vu * vu * cu, minlength=P_all) \
            if req.variance else None

        if has_weights or req.weighted or req.cells_weights:
            wv = flat_w[flat_ix] if flat_w is not None else np.full(n_cells, np.nan)
            wdef = ~np.isnan(wv) & (wv != w_nodata[sel][pid])
            wres = np.where(wdef, wv, np.nan if dw is None else dw)
            ciwi = c64 * wres
            sum_cw = np.bincount(upid, weights=ciwi[used], minlength=P_all) \
                if req.weighted else None
            sum_cxw = np.bincount(upid, weights=(vals * ciwi)[used], minlength=P_all) \
                if req.weighted else None
            sum_cx2w = np.bincount(upid, weights=(vals * vals * ciwi)[used], minlength=P_all) \
                if req.weighted_variance else None
        else:
            sum_cw = sum_cxw = sum_cx2w = None

        if req.minmax:
            big = np.where(used, vals, np.inf)
            small = np.where(used, vals, -np.inf)
            minv = np.minimum.reduceat(big, starts)
            maxv = np.maximum.reduceat(small, starts)
            LARGE = np.iinfo(np.int64).max
            cand_min = np.where(big == minv[pid], cell_id, LARGE)
            cand_max = np.where(small == maxv[pid], cell_id, LARGE)
            min_cell = np.minimum.reduceat(cand_min, starts)
            max_cell = np.minimum.reduceat(cand_max, starts)

        for k in np.flatnonzero(active):
            rec_key = f"k{i}_"
            gidx = sel[k]
            rec = {"zone_id": pairs[gidx][0],
                   rec_key + "n": int(n_per[k]),
                   rec_key + "sum_c": float(sum_c[k]),
                   rec_key + "sum_cx": float(sum_cx[k])}
            if sum_cx2 is not None:
                rec[rec_key + "sum_cx2"] = float(sum_cx2[k])
            if sum_cw is not None:
                rec[rec_key + "sum_cw"] = float(sum_cw[k])
                rec[rec_key + "sum_cxw"] = float(sum_cxw[k])
            if sum_cx2w is not None:
                rec[rec_key + "sum_cx2w"] = float(sum_cx2w[k])
            if req.minmax:
                rec[rec_key + "min_v"] = float(minv[k])
                rec[rec_key + "max_v"] = float(maxv[k])
                rec[rec_key + "min_cell"] = int(min_cell[k])
                rec[rec_key + "max_cell"] = int(max_cell[k])
                if req.store_xy:
                    mr, mc = divmod(int(min_cell[k]), grid_ncols)
                    xr, xc = divmod(int(max_cell[k]), grid_ncols)
                    rec[rec_key + "min_x"] = grid_xmin + (mc + 0.5) * dx
                    rec[rec_key + "min_y"] = grid_ymax - (mr + 0.5) * dy
                    rec[rec_key + "max_x"] = grid_xmin + (xc + 0.5) * dx
                    rec[rec_key + "max_y"] = grid_ymax - (xr + 0.5) * dy
            out_rows.append(rec)
