"""Driver-side calibration-parameter estimation (SURVEY §2.8).

The reference estimates calibration parameters from small collected arrays
(bias-series TOF traces) using scipy/lmfit/fastdtw
(reference: src/sed/calibrator/energy.py:1845-2379). Those dependencies are
not in this runtime, so the same math is implemented on plain numpy:

* ``bin_traces`` — the one distributed step: per-file 1-D TOF histograms via
  a single groupBy(file_id, bin) query (reference EnergyCalibrator.bin_data,
  energy.py:205-292, runs the binner with ``return_partitions=True``).
* ``normspec`` — per-trace smoothing + [0, 1] normalization
  (energy.py:1845-1884); Savitzky-Golay coefficients are derived with a
  pure-numpy local polynomial fit.
* ``find_correspondence`` — dynamic-time-warping path between two traces
  (energy.py:1886-1956; the reference uses fastdtw, we use exact O(n²) DTW
  — traces are ~1e3 samples, driver-side).
* ``peakdetect1d`` — classic lookahead peak detector (energy.py:2038-2179,
  itself adapted from the public Billauer/Bergman algorithm).
* ``peaksearch`` — per-trace peak within a TOF window (energy.py:1958-2003).
* ``poly_energy_calibration`` — differential-drift-time least squares
  (energy.py:2278-2379).
* ``fit_energy_calibration`` — 1/t² model fit via Gauss-Newton
  (energy.py:2106-2276; reference uses lmfit.leastsq).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame

from sed_spark.calibrator.energy import _TOF2EV_CONST  # m_e/2 in eV·s²/m²


# ---------------------------------------------------------------------------
# distributed: bias-series trace extraction
# ---------------------------------------------------------------------------

def bin_traces(
    df: DataFrame,
    tof_column: str = "t",
    bins: int = 1000,
    tof_range: tuple[float, float] = (0.0, 1000.0),
    file_id_column: str = "file_id",
) -> tuple[np.ndarray, np.ndarray, list]:
    """Per-file 1-D TOF histograms → (traces[n_files, bins], tof_centers,
    file_ids). One groupBy(file_id, bin) job — the Spark shape of the
    reference's ``return_partitions=True`` binning (energy.py:205-292)."""
    from sed_spark.binning import sparse_histogram

    agg, norm, bin_names = sparse_histogram(
        df, bins=[bins], axes=[tof_column], ranges=[tof_range],
        extra_group_cols=[file_id_column], count_alias="cnt",
    )
    pdf = agg.toPandas()
    file_ids = sorted(pdf[file_id_column].unique().tolist())
    traces = np.zeros((len(file_ids), norm[0].nbins))
    row_of = {f: i for i, f in enumerate(file_ids)}
    traces[
        pdf[file_id_column].map(row_of).to_numpy(),
        pdf[bin_names[0]].to_numpy(dtype=np.int64),
    ] = pdf["cnt"].to_numpy()
    return traces, norm[0].bin_centers(), file_ids


# ---------------------------------------------------------------------------
# numpy ports
# ---------------------------------------------------------------------------

def savgol_coeffs(window: int, order: int) -> np.ndarray:
    """Savitzky-Golay smoothing kernel from a local polynomial least-squares
    fit (standard construction; replaces scipy.signal.savgol_filter)."""
    if window % 2 == 0:
        window += 1
    half = window // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    vander = np.vander(x, order + 1, increasing=True)
    # projection of the central point: e0ᵀ (VᵀV)⁻¹ Vᵀ
    coeffs = np.linalg.lstsq(vander, np.eye(window), rcond=None)[0][0]
    return coeffs


def normspec(
    specs: np.ndarray,
    smooth: bool = False,
    span: int = 7,
    order: int = 1,
) -> np.ndarray:
    """Smooth (optional) and normalize each trace to [0, 1]
    (reference src/sed/calibrator/energy.py:1845-1884)."""
    specs = np.atleast_2d(np.asarray(specs, dtype=np.float64))
    out = []
    for spec in specs:
        if smooth:
            kernel = savgol_coeffs(span, order)
            spec = np.convolve(
                np.pad(spec, len(kernel) // 2, mode="edge"), kernel, mode="valid",
            )
        rng = spec.max() - spec.min()
        out.append((spec - spec.min()) / rng if rng > 0 else spec * 0.0)
    return np.asarray(out)


def find_correspondence(
    sig_still: np.ndarray,
    sig_moving: np.ndarray,
) -> np.ndarray:
    """DTW alignment path between two 1-D traces
    (reference src/sed/calibrator/energy.py:1886-1956). Exact O(n·m) dynamic
    program instead of the reference's fastdtw approximation."""
    a = np.asarray(sig_still, dtype=np.float64)
    b = np.asarray(sig_moving, dtype=np.float64)
    n, m = len(a), len(b)
    cost = np.abs(a[:, None] - b[None, :])
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        # vectorized inner loop is awkward for DTW; n·m ≤ ~1e6 driver-side
        row = acc[i]
        prev = acc[i - 1]
        for j in range(1, m + 1):
            row[j] = cost[i - 1, j - 1] + min(prev[j], row[j - 1], prev[j - 1])
    # backtrack
    path = [(n - 1, m - 1)]
    i, j = n, m
    while i > 1 or j > 1:
        moves = [(acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1)]
        _, i, j = min(moves)
        path.append((i - 1, j - 1))
    return np.asarray(path[::-1])


def peakdetect1d(
    y_axis: np.ndarray,
    x_axis: np.ndarray | None = None,
    lookahead: int = 200,
    delta: float = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Lookahead local-extrema detector (the public Billauer ``peakdet``
    algorithm, as used by reference energy.py:2038-2179). Returns
    (max_peaks[n,2], min_peaks[n,2]) as (x, y) rows."""
    y_axis = np.asarray(y_axis, dtype=np.float64)
    x_axis = np.arange(len(y_axis)) if x_axis is None else np.asarray(x_axis)
    if len(x_axis) != len(y_axis):
        raise ValueError("x_axis and y_axis must have the same length")
    if lookahead < 1:
        raise ValueError("lookahead must be >= 1")
    if delta < 0:
        raise ValueError("delta must be non-negative")

    max_peaks: list[list[float]] = []
    min_peaks: list[list[float]] = []
    _min, _max = np.inf, -np.inf
    _min_pos = _max_pos = None
    for index in range(len(y_axis) - lookahead):
        x, y = x_axis[index], y_axis[index]
        if y > _max:
            _max, _max_pos = y, x
        if y < _min:
            _min, _min_pos = y, x
        if y < _max - delta and _max != np.inf:
            if y_axis[index:index + lookahead].max() < _max:
                max_peaks.append([_max_pos, _max])
                # switch to minima search until the next minimum confirms
                _max = np.inf
                _min = np.inf
                continue
        if y > _min + delta and _min != -np.inf:
            if y_axis[index:index + lookahead].min() > _min:
                min_peaks.append([_min_pos, _min])
                _min = -np.inf
                _max = -np.inf
    return np.asarray(max_peaks), np.asarray(min_peaks)


def peaksearch(
    traces: np.ndarray,
    tof: np.ndarray,
    ranges: Sequence[tuple[float, float]],
    pkwindow: int = 3,
) -> np.ndarray:
    """Per-trace highest peak inside its TOF window
    (reference src/sed/calibrator/energy.py:1958-2003)."""
    pkmaxs = []
    for trace, (lo, hi) in zip(np.atleast_2d(traces), ranges):
        mask = (tof >= lo) & (tof <= hi)
        tofseg, trseg = tof[mask], trace[mask]
        maxs, _ = peakdetect1d(trseg, tofseg, lookahead=pkwindow)
        if len(maxs) == 0:
            raise ValueError(f"no peak detected in range ({lo}, {hi})")
        best = maxs[np.argmax(maxs[:, 1])]
        pkmaxs.append(best)
    return np.asarray(pkmaxs)


def add_ranges_by_correspondence(
    traces: np.ndarray,
    tof: np.ndarray,
    ref_range: tuple[float, float],
    ref_id: int = 0,
) -> list[tuple[float, float]]:
    """Map a feature window on the reference trace onto every trace via DTW
    (reference src/sed/calibrator/energy.py:317-440 ``add_ranges`` +
    ``find_correspondence``)."""
    traces = np.atleast_2d(traces)
    normed = normspec(traces)
    # exact DTW is O(n²); decimate to ≤512 samples for the window mapping —
    # coarser than the reference's fastdtw radius but the subsequent peak
    # search re-localizes exactly within the mapped window
    ds = max(1, int(np.ceil(normed.shape[1] / 512)))
    coarse = normed[:, ::ds]
    ref = coarse[ref_id]
    lo_idx = int(np.searchsorted(tof, ref_range[0])) // ds
    hi_idx = int(np.searchsorted(tof, ref_range[1])) // ds
    ranges = []
    for i in range(len(traces)):
        if i == ref_id:
            ranges.append(ref_range)
            continue
        path = find_correspondence(ref, coarse[i])
        # indices on the moving trace matched to the window ends
        moving = path[np.searchsorted(path[:, 0], [lo_idx, hi_idx]), 1] * ds
        ranges.append((float(tof[moving[0]]), float(tof[min(moving[1], len(tof) - 1)])))
    return ranges


def calibrate_from_traces(
    traces: np.ndarray,
    tof: np.ndarray,
    biases: np.ndarray,
    ref_range: tuple[float, float],
    ref_energy: float,
    ref_id: int = 0,
    method: str = "lmfit",
    binwidth: float = 4.125e-12,
    binning: int = 1,
    energy_scale: str = "kinetic",
    **kwds,
) -> dict:
    """End-to-end bias-series calibration: DTW range propagation →
    per-trace peak search → poly or 1/t² fit
    (reference src/sed/calibrator/energy.py:501-599 ``calibrate``).

    The traces come from :func:`bin_traces` (distributed); everything here
    is driver-side numpy on a (n_biases × n_bins) matrix. ``biases`` are
    applied with the sign convention vals = -bias (kinetic scale).
    """
    traces = np.atleast_2d(traces)
    biases = np.asarray(biases, dtype=np.float64)
    ranges = add_ranges_by_correspondence(traces, tof, ref_range, ref_id)
    # reorder so the reference trace leads (anchors E0)
    order = [ref_id, *[i for i in range(len(traces)) if i != ref_id]]
    peaks = peaksearch(traces[order], tof, [ranges[i] for i in order], **kwds)
    pos = peaks[:, 0]
    sign = 1.0 if energy_scale == "kinetic" else -1.0
    vals = -sign * biases[order]
    if method in ("lmfit", "fit"):
        cal = fit_energy_calibration(
            pos, vals, binwidth, binning, ref_energy, t=tof,
            energy_scale=energy_scale,
        )
    elif method in ("lstsq", "poly"):
        cal = poly_energy_calibration(
            pos, vals, ref_energy, t=tof, energy_scale=energy_scale,
        )
    else:
        raise ValueError(f"unknown calibration method {method!r}")
    cal["refid"] = ref_id
    return cal


def _tof2ev(d, t0, binwidth, binning, energy_scale, e0, t):
    sign = 1.0 if energy_scale == "kinetic" else -1.0
    tt = np.asarray(t, dtype=np.float64) * binwidth * binning - t0
    return sign * _TOF2EV_CONST * (d / tt) ** 2 + e0


def _tof2evpoly(poly_a, e0, t):
    t = np.asarray(t, dtype=np.float64)
    acc = np.zeros_like(t)
    for coeff in poly_a:
        acc = (acc + coeff) * t
    return acc + e0


def poly_energy_calibration(
    pos: Sequence[float],
    vals: Sequence[float],
    ref_energy: float,
    order: int = 3,
    t: np.ndarray | None = None,
    aug: int = 1,
    energy_scale: str = "kinetic",
) -> dict:
    """Polynomial energy calibration from bias-series landmarks: solve the
    differential system T·a = b with least squares
    (reference src/sed/calibrator/energy.py:2278-2379). ``pos`` are peak TOF
    positions per bias trace, ``vals`` the bias voltages."""
    pos = np.asarray(pos, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    nvals = vals.size
    polyorder = np.arange(order, 0, -1)

    t_main = np.tile([pos[0] ** p for p in polyorder], (aug * (nvals - 1), 1))
    t_sec = np.array([
        [pos[term] ** p for p in polyorder]
        for term in np.tile(np.arange(1, nvals), aug)
    ])
    t_mat = t_main - t_sec
    bvec = np.tile(vals[0] - vals[1:], aug)

    poly_a = np.linalg.lstsq(t_mat, bvec, rcond=None)[0]

    ecalibdict = {
        "offset": float(pos.min()),
        "coeffs": poly_a,
        "Tmat": t_mat,
        "bvec": bvec,
        "energy_scale": energy_scale,
        "E0": float(-(_tof2evpoly(poly_a, -ref_energy, pos[0]) + vals[0])),
    }
    if t is not None:
        ecalibdict["axis"] = _tof2evpoly(poly_a, -ecalibdict["E0"], t)
    return ecalibdict


def fit_energy_calibration(
    pos: Sequence[float],
    vals: Sequence[float],
    binwidth: float,
    binning: int,
    ref_energy: float,
    t: np.ndarray | None = None,
    energy_scale: str = "kinetic",
    d_init: float = 1.0,
    t0_init: float = 1e-6,
    max_iter: int = 200,
) -> dict:
    """Fit the physical 1/t² TOF-energy model ``E = sign·c·(d/(t·bw·bin −
    t0))² + E0`` to bias-series landmarks with damped Gauss-Newton
    (reference src/sed/calibrator/energy.py:2106-2276 uses lmfit.leastsq;
    same residual, numpy-only solver)."""
    pos = np.asarray(pos, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    # t0 must stay below the shortest flight time or the model pole flips
    t0_bound = (pos.min() - 1) * binwidth * binning
    if t0_init >= t0_bound:
        t0_init = 0.5 * t0_bound
    params = np.array([d_init, t0_init, float(vals.min())])
    lam = 1e-3

    def residual(p):
        return _tof2ev(p[0], p[1], binwidth, binning, energy_scale, p[2], pos) - vals

    r = residual(params)
    sse = float(r @ r)
    for _ in range(max_iter):
        # numerical Jacobian
        jac = np.empty((len(pos), 3))
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = max(1e-9, abs(params[k]) * 1e-7)
            jac[:, k] = (residual(params + dp) - r) / dp[k]
        jtj = jac.T @ jac
        step = np.linalg.solve(jtj + lam * np.diag(np.diag(jtj)), -jac.T @ r)
        candidate = params + step
        # keep t0 below the smallest flight time (reference bound)
        candidate[1] = min(candidate[1], (pos.min() - 1) * binwidth * binning)
        r_new = residual(candidate)
        sse_new = float(r_new @ r_new)
        if sse_new < sse:
            params, r, lam = candidate, r_new, max(lam / 3, 1e-12)
            if sse - sse_new < 1e-14 * max(sse, 1e-30):
                sse = sse_new
                break
            sse = sse_new
        else:
            lam *= 10
            if lam > 1e12:
                break

    d_fit, t0_fit, _ = params
    energy_offset = _tof2ev(d_fit, t0_fit, binwidth, binning, energy_scale,
                            -ref_energy, pos[0])
    e0 = float(-(energy_offset - vals[0]))
    ecalibdict = {
        "d": float(d_fit),
        "t0": float(t0_fit),
        "E0": e0,
        "energy_scale": energy_scale,
    }
    if t is not None:
        ecalibdict["axis"] = _tof2ev(d_fit, t0_fit, binwidth, binning,
                                     energy_scale, e0, t)
    return ecalibdict
