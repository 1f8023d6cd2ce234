"""Driver-side momentum distortion estimation (SURVEY §2.8).

The reference estimates the detector deformation field from symmetry
landmarks with the ``symmetrize`` package (thin-plate splines) and inverts
it with ``scipy.interpolate.griddata``
(reference: src/sed/calibrator/momentum.py:419-826, 2143-2215). Neither
dependency exists in this runtime, so the same math is implemented directly:

* thin-plate-spline warping is a small dense linear solve (the classic
  Bookstein formulation — public knowledge);
* the inverse field is computed by damped fixed-point iteration on the
  forward field (converges for the smooth, small-amplitude distortions this
  calibration produces) instead of scattered-data regridding;
* 2-D feature extraction is a local-maximum filter.

Everything here consumes the small binned k-space slice on the driver; the
distributed operator that APPLIES the field is
:func:`sed_spark.calibrator.momentum.apply_dfield`.
"""

from __future__ import annotations

import numpy as np

from sed_spark.calibrator.momentum import bilinear_sample, bilinear_sample_pair

__all__ = [
    "peakdetect2d",
    "thin_plate_spline",
    "spline_warp_field",
    "coordinate_transform_field",
    "generate_inverse_dfield",
]


def peakdetect2d(image: np.ndarray, radius: int = 5, threshold: float = 0.0,
                 max_peaks: int = 64) -> np.ndarray:
    """Local-maximum peak detection on a 2-D slice
    (reference src/sed/calibrator/momentum.py:419-478 uses
    ``symmetrize.pointops.peakdetect2d``). Returns (n, 2) array of (row,
    col) positions sorted by descending intensity."""
    img = np.asarray(image, dtype=np.float64)
    h, w = img.shape
    # dilate by shifting — a point is a peak if it equals the neighborhood max
    padded = np.full((h + 2 * radius, w + 2 * radius), -np.inf)
    padded[radius:radius + h, radius:radius + w] = img
    neigh_max = np.full_like(img, -np.inf)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            view = padded[radius + dr:radius + dr + h, radius + dc:radius + dc + w]
            neigh_max = np.maximum(neigh_max, view)
    is_peak = (img >= neigh_max) & (img > threshold)
    rows, cols = np.nonzero(is_peak)
    order = np.argsort(img[rows, cols])[::-1][:max_peaks]
    return np.column_stack([rows[order], cols[order]]).astype(np.float64)


def thin_plate_spline(
    source: np.ndarray,
    target: np.ndarray,
    smoothing: float = 0.0,
):
    """Fit a 2-D thin-plate-spline mapping source→target landmarks.

    Bookstein's TPS: f(p) = a0 + a·p + Σ wᵢ U(|p − srcᵢ|), U(r) = r² log r².
    Returns a callable evaluating the warp at (n, 2) query points. This is
    the same model the reference's ``symmetrize.tps`` applies
    (momentum.py:627-826)."""
    src = np.asarray(source, dtype=np.float64)
    dst = np.asarray(target, dtype=np.float64)
    n = len(src)
    if n < 3:
        raise ValueError("need at least 3 landmarks for a TPS fit")

    def radial(d2):
        with np.errstate(divide="ignore", invalid="ignore"):
            out = d2 * np.log(d2)
        return np.nan_to_num(out, nan=0.0, neginf=0.0)

    d2 = np.sum((src[:, None, :] - src[None, :, :]) ** 2, axis=-1)
    kmat = radial(d2) + smoothing * np.eye(n)
    pmat = np.hstack([np.ones((n, 1)), src])
    lmat = np.zeros((n + 3, n + 3))
    lmat[:n, :n] = kmat
    lmat[:n, n:] = pmat
    lmat[n:, :n] = pmat.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n] = dst
    params = np.linalg.solve(lmat, rhs)
    w, a = params[:n], params[n:]

    def warp(points: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
        d2q = np.sum((pts[:, None, :] - src[None, :, :]) ** 2, axis=-1)
        return radial(d2q) @ w + a[0] + pts @ a[1:]

    return warp


def spline_warp_field(
    features: np.ndarray,
    targets: np.ndarray,
    shape: tuple[int, int],
    include_center: bool = True,
    center: tuple[float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense (rdeform, cdeform) field warping ``features`` onto ``targets``
    (reference spline_warp_estimate, momentum.py:627-826: symmetry landmark
    positions → ideal symmetric positions).

    Convention follows the reference: the returned field maps CORRECTED
    coordinates to ORIGINAL ones (an inverse warp, ready for resampling),
    i.e. deform[r, c] = tps(target→feature)(r, c).
    """
    src = np.asarray(targets, dtype=np.float64)
    dst = np.asarray(features, dtype=np.float64)
    if include_center and center is not None:
        src = np.vstack([src, center])
        dst = np.vstack([dst, center])
    warp = thin_plate_spline(src, dst)
    h, w = shape
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pts = np.column_stack([rr.ravel(), cc.ravel()])
    mapped = warp(pts)
    return mapped[:, 0].reshape(shape), mapped[:, 1].reshape(shape)


def coordinate_transform_field(
    shape: tuple[int, int],
    transform_type: str,
    rdeform_field: np.ndarray | None = None,
    cdeform_field: np.ndarray | None = None,
    **kwds,
) -> tuple[np.ndarray, np.ndarray]:
    """Compose an affine pose adjustment (translation / scaling / rotation)
    onto an existing deformation field
    (reference coordinate_transform + pose_adjustment,
    momentum.py:910-1287). Fields use the same inverse-warp convention as
    :func:`spline_warp_field`."""
    h, w = shape
    rr, cc = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    if transform_type == "translation":
        xtrans, ytrans = kwds.get("xtrans", 0.0), kwds.get("ytrans", 0.0)
        rsrc, csrc = rr - xtrans, cc - ytrans
    elif transform_type == "scaling":
        xs, ys = kwds.get("xscale", 1.0), kwds.get("yscale", 1.0)
        xc = kwds.get("xcenter", (h - 1) / 2)
        yc = kwds.get("ycenter", (w - 1) / 2)
        rsrc = xc + (rr - xc) / xs
        csrc = yc + (cc - yc) / ys
    elif transform_type == "rotation":
        angle = np.radians(kwds.get("angle", 0.0))
        xc = kwds.get("center", ((h - 1) / 2, (w - 1) / 2))[0]
        yc = kwds.get("center", ((h - 1) / 2, (w - 1) / 2))[1]
        cosa, sina = np.cos(angle), np.sin(angle)
        rsrc = xc + (rr - xc) * cosa + (cc - yc) * sina
        csrc = yc - (rr - xc) * sina + (cc - yc) * cosa
    else:
        raise ValueError(f"unknown transform_type {transform_type!r}")

    if rdeform_field is None:
        return rsrc, csrc
    # compose: sample the existing field at the new source coordinates
    return (
        bilinear_sample(rdeform_field, rsrc.ravel(), csrc.ravel()).reshape(shape),
        bilinear_sample(cdeform_field, rsrc.ravel(), csrc.ravel()).reshape(shape),
    )


def _upsample_regular(coarse: np.ndarray, stride: int, h: int, w: int) -> np.ndarray:
    """Bilinear upsample of a stride-subsampled lattice to (h, w).

    Separable interpolation with slice arithmetic — no gather indexing, so
    it's several times faster than a generic bilinear lookup at the same
    output size (this runs once per inversion on the full fine grid).
    """
    ch, cw = coarse.shape
    ri = np.minimum(np.arange(h) / stride, ch - 1.0)
    ci = np.minimum(np.arange(w) / stride, cw - 1.0)
    r0 = np.minimum(ri.astype(np.int64), ch - 2)
    c0 = np.minimum(ci.astype(np.int64), cw - 2)
    fr = (ri - r0)[:, None]
    fc = (ci - c0)[None, :]
    rows_lo = coarse[r0]
    rows_hi = coarse[r0 + 1]
    top = rows_lo[:, c0] * (1 - fc) + rows_lo[:, c0 + 1] * fc
    bot = rows_hi[:, c0] * (1 - fc) + rows_hi[:, c0 + 1] * fc
    return top * (1 - fr) + bot * fr


def generate_inverse_dfield(
    rdeform_field: np.ndarray,
    cdeform_field: np.ndarray,
    bin_ranges: list[tuple[float, float]] | None = None,
    detector_ranges: list[tuple[float, float]] | None = None,
    max_iter: int = 50,
    tol: float = 1e-3,
) -> np.ndarray:
    """Invert a smooth deformation field by damped fixed-point iteration.

    The reference scatters the forward field and regrids with
    ``scipy.interpolate.griddata`` (momentum.py:2143-2215). For the smooth
    small-amplitude fields this calibration produces, solving
    ``F(p) = q`` per grid point with ``p ← p + (q − F(p))`` converges in a
    handful of sweeps, is fully vectorized, and needs no scattered-data
    machinery. Returns the (2, H, W) inverse field consumed by
    ``apply_dfield``.
    """
    # float32 throughout the iteration: the solve is memory-bandwidth
    # bound (8 gathers + ~10 full-grid temporaries per sweep), and float32
    # position error at grid scale (~2.4e-4 px at 2048) sits far below
    # both tol and the 5e-3 round-trip accuracy contract; results upcast
    # at the end. Fine-level sweeps run in 8 row-block threads (numpy
    # releases the GIL in the gathers/ufuncs): 3.9 s → 0.9-2.0 s on the
    # 2048² bench, bitwise-identical output.
    rdef = np.asarray(rdeform_field, dtype=np.float32)
    cdef = np.asarray(cdeform_field, dtype=np.float32)
    h, w = rdef.shape
    rr, cc = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # displacement amplitude: targets closer than this to an edge may have
    # their inverse in (or routed through) the clamped extrapolation zone,
    # where the fixed point creeps instead of contracting — and where the
    # reference's griddata yields NaN anyway. They get best-effort values
    # but don't gate convergence.
    margin = float(max(np.abs(rdef - rr).max(), np.abs(cdef - cc).max())) + 1.0

    def _solve(rd, cd, tr, tc, rp, cp, scale, iters):
        # F evaluated with edge-clamped sampling: cval=0 would send
        # boundary iterates across the grid and the residual would never
        # shrink
        hi_r = (rd.shape[0] - 1) * scale
        hi_c = (rd.shape[1] - 1) * scale
        gate = (
            (tr >= margin) & (tr <= hi_r - margin)
            & (tc >= margin) & (tc <= hi_c - margin)
        )
        if not gate.any():
            gate = None

        # every sweep op is elementwise over the lattice, so row-block
        # threading changes nothing numerically (identical per-element
        # arithmetic, read-only shared grids) while the big gathers and
        # ufuncs release the GIL; only the fine level is large enough to
        # amortize thread dispatch
        trf, tcf = tr.ravel(), tc.ravel()
        # ravel() silently copies for non-contiguous arrays; force copies
        # and write back at the end so chunk updates can never be lost
        rpf = np.ascontiguousarray(rp).ravel()
        cpf = np.ascontiguousarray(cp).ravel()
        gf = gate.ravel() if gate is not None else None
        n = trf.shape[0]
        import os
        from concurrent.futures import ThreadPoolExecutor

        n_threads = min(8, os.cpu_count() or 1) if n >= 1_000_000 else 1
        bounds = [
            (n * t // n_threads, n * (t + 1) // n_threads)
            for t in range(n_threads)
        ]

        def sweep_chunk(lo: int, hi_: int) -> float:
            pos_r, pos_c = rpf[lo:hi_], cpf[lo:hi_]
            if scale != 1.0:
                pos_r, pos_c = pos_r / scale, pos_c / scale
            fr, fc = bilinear_sample_pair(rd, cd, pos_r, pos_c)
            dr = trf[lo:hi_] - fr
            dc = tcf[lo:hi_] - fc
            rpf[lo:hi_] += dr
            cpf[lo:hi_] += dc
            if gf is not None:
                g = gf[lo:hi_]
                if not g.any():
                    return 0.0
                return float(max(np.abs(dr[g]).max(), np.abs(dc[g]).max()))
            return float(max(np.abs(dr).max(), np.abs(dc).max()))

        if n_threads == 1:
            for _ in range(iters):
                if sweep_chunk(0, n) < tol:
                    break
        else:
            with ThreadPoolExecutor(max_workers=n_threads) as pool:
                for _ in range(iters):
                    res = max(
                        pool.map(lambda b: sweep_chunk(*b), bounds),
                    )
                    if res < tol:
                        break
        rp[...] = rpf.reshape(rp.shape)
        cp[...] = cpf.reshape(cp.shape)
        return rp, cp
    stride = 8 if min(h, w) >= 512 else 1
    if stride > 1:
        # coarse-to-fine: solve on a stride-subsampled lattice first, then
        # upsample that inverse as the fine initial guess — most of the
        # Newton work happens on 1/64th of the points
        rs, cs = rdef[::stride, ::stride], cdef[::stride, ::stride]
        rrc, ccc = rr[::stride, ::stride], cc[::stride, ::stride]
        rpc, cpc = _solve(rs, cs, rrc, ccc, rrc.copy(), ccc.copy(),
                          float(stride), max_iter)
        # edge-lattice values are clamp-creep junk; the true inverse never
        # displaces more than the field amplitude, so clip the guess there
        # — keeps the fine level at 2-3 Newton sweeps instead of ~10
        np.clip(rpc, rrc - margin, rrc + margin, out=rpc)
        np.clip(cpc, ccc - margin, ccc + margin, out=cpc)
        rp = _upsample_regular(rpc, stride, h, w).astype(np.float32)
        cp = _upsample_regular(cpc, stride, h, w).astype(np.float32)
    else:
        rp, cp = rr.copy(), cc.copy()
    rp, cp = _solve(rdef, cdef, rr, cc, rp, cp, 1.0, max_iter)
    inverse = np.stack([rp, cp]).astype(np.float64)
    if bin_ranges and detector_ranges:
        # rescale from bin index space to detector coordinates, like the
        # reference's interp_ranges handling (momentum.py:2180-2204)
        for axis, ((blo, bhi), (dlo, dhi)) in enumerate(
            zip(bin_ranges, detector_ranges),
        ):
            n = inverse.shape[1 + axis]
            scale = (bhi - blo) / n
            inverse[axis] = inverse[axis] * scale + blo
    return inverse
