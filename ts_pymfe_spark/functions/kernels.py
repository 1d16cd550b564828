"""Pure-numpy per-series kernels — the Arrow-UDF compute layer.

These re-derive the reference's library-backed computations
(statsmodels/scipy/nolds are NOT vendored — each kernel is written
from the published formula, with the reference call-site cited) so the
exact same code runs inside Spark ``applyInPandas`` workers AND in the
fixture generator — bit-match by construction (SURVEY §5.2).

No Spark imports here: this module is importable by tests, fixture
generation, and the Arrow wrappers alike.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# ACF / PACF / period  (reference: autocorr.py, _period.py)
# ---------------------------------------------------------------------------

def acf(ts: np.ndarray, nlags: int | None = None, adjusted: bool = True) -> np.ndarray:
    """Autocorrelation function, FFT-based, statsmodels semantics
    (``autocorr.py:128-191`` calls statsmodels ``acf(adjusted=True,
    fft=True)``; lag 0 dropped by the caller).  Returns lags 1..nlags.

    acov(k) = (1/d_k) Σ_t (x_t−μ)(x_{t+k}−μ), d_k = n−k (adjusted) or n;
    acf(k) = acov(k)/acov(0) with acov(0) always /n.
    """
    x = np.asarray(ts, dtype=float)
    n = x.size
    if nlags is None:
        nlags = min(int(10 * np.log10(n)), n - 1) if n > 1 else 0
    nlags = max(0, min(nlags, n - 1))
    xd = x - x.mean()
    # FFT autocovariance (circular-free via zero padding to 2^ceil)
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    fr = np.fft.rfft(xd, nfft)
    acov_full = np.fft.irfft(fr * np.conjugate(fr), nfft)[: nlags + 1]
    acov = acov_full / n
    if adjusted:
        d = n - np.arange(nlags + 1)
        acov = acov_full / d
        acov[0] = acov_full[0] / n
    c0 = acov_full[0] / n
    if c0 == 0:
        return np.full(nlags, np.nan)
    return (acov / c0)[1:]


def pacf_ols(ts: np.ndarray, nlags: int, adjusted: bool = True) -> np.ndarray:
    """Partial autocorrelation via per-lag OLS (statsmodels
    ``pacf(method='ols-adjusted')``, used at ``autocorr.py:194-250``):
    regress x_t on [1, x_{t-1..t-k}]; pacf(k) = last coefficient,
    scaled by n/(n-k) when adjusted.  Returns lags 1..nlags."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    nlags = min(nlags, n // 2 - 1) if n >= 4 else 0
    out = np.full(nlags, np.nan)
    x0 = x - x.mean()
    for k in range(1, nlags + 1):
        # design: rows t = k..n-1, cols [x_{t-1}, ..., x_{t-k}], + const
        cols = [x0[k - j - 1 : n - j - 1] for j in range(k)]
        X = np.column_stack([np.ones(n - k)] + cols)
        y = x0[k:]
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        coef = beta[-1]
        if adjusted:
            coef *= n / (n - k)
        out[k - 1] = coef
    return out


def ts_period(ts: np.ndarray) -> int:
    """Dominant period (reference ``_period.py:14-45``): detrend first
    (reference: SuperSmoother residuals; here: centered-MA residuals —
    same role, documented divergence since supersmoother is
    unavailable), then argmax |ACF| up to n/2, +1 lag offset."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    if n < 4:
        return 1
    detrended = x - _trend_ma(x)
    a = acf(detrended, nlags=n // 2, adjusted=True)
    if a.size == 0 or np.all(~np.isfinite(a)):
        return 1
    return int(np.nanargmax(np.abs(a))) + 1


def _trend_ma(x: np.ndarray, w: int | None = None) -> np.ndarray:
    """Centered moving-average trend with shrinking edges, O(n)."""
    n = x.size
    if w is None:
        w = max(3, n // 10)
    if w % 2 == 0:
        w += 1
    w = min(w, n if n % 2 == 1 else n - 1)
    half = w // 2
    c = np.concatenate([[0.0], np.cumsum(x)])
    lo = np.maximum(np.arange(n) - half, 0)
    hi = np.minimum(np.arange(n) + half + 1, n)
    return (c[hi] - c[lo]) / (hi - lo)


def first_acf_nonsig(acfs: np.ndarray, n: int, threshold: float | None = None) -> float:
    """First lag with |acf| below the significance line 1.96/sqrt(n)
    (``autocorr.py:562-617``).  Returns nan when none."""
    crit = threshold if threshold is not None else 1.96 / math.sqrt(n)
    idx = np.flatnonzero(np.abs(acfs) <= crit)
    return float(idx[0] + 1) if idx.size else np.nan


def first_acf_nonpos(acfs: np.ndarray) -> float:
    """First lag with acf <= 0 (``autocorr.py:620-659``)."""
    idx = np.flatnonzero(acfs <= 0)
    return float(idx[0] + 1) if idx.size else np.nan


def first_local_min(arr: np.ndarray) -> float:
    """Index (1-based lag) of first local minimum (``autocorr.py:662-708``;
    crit-pt kernel ``_utils.py:170-213``)."""
    a = np.asarray(arr, dtype=float)
    if a.size < 3:
        return np.nan
    mins = (a[1:-1] < a[:-2]) & (a[1:-1] < a[2:])
    idx = np.flatnonzero(mins)
    return float(idx[0] + 2) if idx.size else np.nan


# ---------------------------------------------------------------------------
# Decomposition (reference: _detrend.py — STL/SuperSmoother; here a
# deterministic classical decomposition, documented divergence since
# statsmodels/supersmoother are unavailable in this environment)
# ---------------------------------------------------------------------------

def decompose(ts: np.ndarray, period: int | None = None) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(trend, season, resid) additive decomposition.

    trend: centered moving average (window = period if >1 else
    max(3, n//10) forced odd, edges via shrinking window);
    season: per-phase means of the detrended series, zero-sum
    normalized (classical decomposition); resid = x − trend − season.
    Reference counterpart: ``_detrend.py:117-182`` (STL when period>1
    else Friedman SuperSmoother with zero seasonal)."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    if period is None:
        period = ts_period(x)
    w = period if period and period > 1 else max(3, n // 10)
    trend = _trend_ma(x, w)
    det = x - trend
    if period and period > 1:
        season = np.zeros(n)
        phases = np.arange(n) % period
        means = np.array([det[phases == p].mean() if np.any(phases == p) else 0.0
                          for p in range(period)])
        means = means - means.mean()
        season = means[phases]
    else:
        season = np.zeros(n)
    resid = x - trend - season
    return trend, season, resid


# ---------------------------------------------------------------------------
# Spectral (reference: freq_domain.py — scipy.signal.periodogram)
# ---------------------------------------------------------------------------

def periodogram_hamming(ts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One-sided power spectral density with a Hamming window, fs=1,
    'density' scaling — scipy.signal.periodogram semantics used at
    ``freq_domain.py:50-79``.  Returns (freqs, power) excluding f=0."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    win = np.hamming(n)
    xd = (x - x.mean()) * win  # detrend='constant' is scipy default
    scale = 1.0 / (win * win).sum()
    spec = np.fft.rfft(xd)
    p = (np.abs(spec) ** 2) * scale
    # one-sided doubling (all bins except DC and Nyquist-if-even)
    if n % 2 == 0:
        p[1:-1] *= 2
    else:
        p[1:] *= 2
    freqs = np.fft.rfftfreq(n, d=1.0)
    return freqs[1:], p[1:]


def ps_freqs_topk(power: np.ndarray, frac: float = 0.05) -> np.ndarray:
    """Top ⌈frac·m⌉ largest powers, descending (``freq_domain.py:122-171``)."""
    k = int(np.ceil(frac * power.size))
    return np.sort(power)[::-1][:k]


def ps_peaks(power: np.ndarray, factor: float = 0.6) -> np.ndarray:
    """Binary indicator power >= factor·max (``freq_domain.py:174-230``)."""
    return (power >= factor * power.max()).astype(float)


def ps_entropy(power: np.ndarray, normalize: bool = True) -> float:
    """Normalized spectral entropy, base 2 (``freq_domain.py:233-302``)."""
    p = power / power.sum()
    p = p[p > 0]
    h = -float(np.sum(p * np.log2(p)))
    return h / math.log2(power.size) if normalize else h


def low_freq_power(ts: np.ndarray, threshold: float = 0.04) -> float:
    """Fraction of spectral power below ``threshold`` on the [0, π]
    angular-frequency scale, Hann-ish windowed spectrum
    (``freq_domain.py:305-350``)."""
    freqs, power = periodogram_hamming(ts)
    w = 2 * np.pi * freqs  # rad/sample in (0, π]
    mask = w <= threshold * np.pi
    total = power.sum()
    return float(power[mask].sum() / total) if total > 0 else np.nan


# ---------------------------------------------------------------------------
# Entropy family (reference: info_theory.py)
# ---------------------------------------------------------------------------

def hist_counts(x: np.ndarray, bins: int) -> np.ndarray:
    """np.histogram equal-width counts (right-closed last bin)."""
    c, _ = np.histogram(x, bins=bins)
    return c


def hist_entropy(ts: np.ndarray, num_bins: int = 10, normalize: bool = True) -> float:
    """(``info_theory.py:221-255``) scipy.stats.entropy of histogram
    counts (natural log), / log(num_bins) when normalized."""
    c = hist_counts(np.asarray(ts, float), num_bins)
    p = c / c.sum()
    p = p[p > 0]
    h = -float(np.sum(p * np.log(p)))
    return h / math.log(num_bins) if normalize else h


def ami(ts: np.ndarray, lags: np.ndarray | list[int], num_bins: int = 64) -> np.ndarray:
    """Auto-mutual information per lag via 2-D histograms
    (``info_theory.py:148-218``): I = H(x)+H(y)−H(x,y), natural log."""
    x = np.asarray(ts, dtype=float)
    out = []
    for lag in lags:
        a, b = x[:-lag], x[lag:]
        joint, _, _ = np.histogram2d(a, b, bins=num_bins)
        p = joint / joint.sum()
        px, py = p.sum(axis=1), p.sum(axis=0)
        def ent(q):
            q = q[q > 0]
            return -float(np.sum(q * np.log(q)))
        out.append(ent(px) + ent(py) - ent(p.ravel()))
    return np.array(out)


def _embed(x: np.ndarray, dim: int, lag: int = 1) -> np.ndarray:
    """Takens embedding matrix, reference ``_embed.py:26-74`` ordering
    (most recent first)."""
    n = x.size - (dim - 1) * lag
    return np.column_stack([x[(dim - 1 - j) * lag : (dim - 1 - j) * lag + n]
                            for j in range(dim)])


def approx_entropy(ts: np.ndarray, m: int = 2, factor: float = 0.2,
                   max_n: int = 512) -> float:
    """ApEn(m, r=factor·std, Chebyshev) — ``info_theory.py:764-837``.
    O(n²); input truncated to the last ``max_n`` points (engine length
    cap, mirroring the reference tests' 512-point truncation)."""
    x = np.asarray(ts, dtype=float)
    if x.size > max_n:
        x = x[-max_n:]
    r = factor * x.std(ddof=0)
    def phi(mm: int) -> float:
        emb = _embed(x, mm)
        n = emb.shape[0]
        # chebyshev distances
        d = np.max(np.abs(emb[:, None, :] - emb[None, :, :]), axis=2)
        c = (d <= r).sum(axis=1) / n
        return float(np.mean(np.log(c)))
    return phi(m) - phi(m + 1)


def sample_entropy(ts: np.ndarray, m: int = 2, factor: float = 0.2,
                   max_n: int = 512) -> float:
    """SampEn — ``info_theory.py:840-914`` (nolds sampen semantics:
    r = factor·std, Chebyshev, self-matches excluded)."""
    x = np.asarray(ts, dtype=float)
    if x.size > max_n:
        x = x[-max_n:]
    r = factor * x.std(ddof=0)
    def count(mm: int) -> int:
        emb = _embed(x, mm)
        d = np.max(np.abs(emb[:, None, :] - emb[None, :, :]), axis=2)
        iu = np.triu_indices(emb.shape[0], k=1)
        return int((d[iu] <= r).sum())
    a, b = count(m + 1), count(m)
    if b == 0 or a == 0:
        return np.nan
    return -math.log(a / b)


def lz_complexity(ts: np.ndarray, num_bins: int = 10) -> float:
    """Lempel-Ziv complexity of the equal-width-discretized series,
    normalized by n/log2(n) — ``info_theory.py:1169-1232``."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    mn, mx = x.min(), x.max()
    if mx == mn:
        sym = np.zeros(n, dtype=int)
    else:
        sym = np.minimum(((x - mn) / ((mx - mn) / num_bins)).astype(int),
                         num_bins - 1)
    s = sym.tolist()
    substrings = set()
    i, k = 0, 1
    while i + k <= n:
        sub = tuple(s[i : i + k])
        if sub in substrings:
            k += 1
        else:
            substrings.add(sub)
            i += k
            k = 1
    return len(substrings) / (n / math.log2(n)) if n > 1 else np.nan


# ---------------------------------------------------------------------------
# Long-memory / fractal (reference: global_stats.py via nolds)
# ---------------------------------------------------------------------------

def hurst_rs(ts: np.ndarray) -> float:
    """Hurst exponent via rescaled-range (R/S) regression over
    logarithmically-spaced window sizes (nolds ``hurst_rs`` approach,
    used at ``global_stats.py:691-720``)."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    if n < 20:
        return np.nan
    sizes = np.unique(np.floor(np.logspace(np.log10(10), np.log10(n // 2), 15)).astype(int))
    rs_vals, used = [], []
    for w in sizes:
        m = n // w
        if m < 1:
            continue
        chunks = x[: m * w].reshape(m, w)
        dev = chunks - chunks.mean(axis=1, keepdims=True)
        z = np.cumsum(dev, axis=1)
        rng = z.max(axis=1) - z.min(axis=1)
        std = chunks.std(axis=1, ddof=0)
        ok = std > 0
        if not ok.any():
            continue
        rs_vals.append(float(np.mean(rng[ok] / std[ok])))
        used.append(w)
    if len(used) < 3:
        return np.nan
    coef = np.polyfit(np.log(used), np.log(rs_vals), 1)
    return float(coef[0])


def dfa(ts: np.ndarray, order: int = 1) -> float:
    """Detrended fluctuation analysis exponent (nolds ``dfa`` approach,
    ``global_stats.py:723-767``): profile -> windowed polyfit detrend ->
    log-log slope of fluctuation vs window size."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    if n < 20:
        return np.nan
    y = np.cumsum(x - x.mean())
    sizes = np.unique(np.floor(np.logspace(np.log10(4), np.log10(n // 4), 15)).astype(int))
    flucts, used = [], []
    t = np.arange(n)
    for w in sizes:
        if w < order + 2:
            continue
        m = n // w
        if m < 2:
            continue
        segs = y[: m * w].reshape(m, w)
        tt = np.arange(w)
        # vectorized per-segment polyfit via vandermonde lstsq
        V = np.vander(tt, order + 1)
        coef, *_ = np.linalg.lstsq(V, segs.T, rcond=None)
        detr = segs.T - V @ coef
        f = np.sqrt(np.mean(detr**2, axis=0))
        flucts.append(float(np.mean(f)))
        used.append(w)
    if len(used) < 3:
        return np.nan
    coef = np.polyfit(np.log(used), np.log(flucts), 1)
    return float(coef[0])


# ---------------------------------------------------------------------------
# Statistical tests (reference: stat_tests.py) — numpy re-derivations
# ---------------------------------------------------------------------------

def _gammainc_upper_reg(s: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(s,x) via series/continued
    fraction (Numerical Recipes construction) — powers the chi2 sf."""
    if x < 0 or s <= 0:
        return np.nan
    if x == 0:
        return 1.0
    if x < s + 1:
        # lower series
        term = 1.0 / s
        total = term
        a = s
        for _ in range(500):
            a += 1
            term *= x / a
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + s * math.log(x) - math.lgamma(s))
        return 1.0 - p
    # continued fraction for upper
    tiny = 1e-300
    b = x + 1 - s
    c = 1 / tiny
    d = 1 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - s)
        b += 2
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1 / d
        delta = d * c
        h *= delta
        if abs(delta - 1) < 1e-15:
            break
    return h * math.exp(-x + s * math.log(x) - math.lgamma(s))


def chi2_sf(x: float, df: float) -> float:
    """Chi-squared survival function P(X > x)."""
    return _gammainc_upper_reg(df / 2.0, x / 2.0)


def ljung_box(ts: np.ndarray, max_lags: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Ljung-Box Q statistics and p-values for lags 1..max_lags
    (statsmodels ``acorr_ljungbox`` formula, used at
    ``stat_tests.py:72-124``): Q_h = n(n+2) Σ_{k≤h} acf_k²/(n−k)."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    max_lags = min(max_lags, n - 2)
    a = acf(x, nlags=max_lags, adjusted=False)
    k = np.arange(1, max_lags + 1)
    q = n * (n + 2) * np.cumsum(a**2 / (n - k))
    p = np.array([chi2_sf(qi, df) for qi, df in zip(q, k)])
    return q, p


def durbin_watson(x: np.ndarray) -> float:
    """DW statistic Σ(Δx)²/Σx² (statsmodels ``durbin_watson``; the
    reference scales /4 at ``stat_tests.py:29-69``)."""
    x = np.asarray(x, dtype=float)
    return float(np.sum(np.diff(x) ** 2) / np.sum(x * x))


# ---------------------------------------------------------------------------
# Stateful recurrences (reference: general.py — inherently sequential)
# ---------------------------------------------------------------------------

def walker_path(ts: np.ndarray, step_size: float = 0.1,
                start_point: float | None = None) -> np.ndarray:
    """Particle attracted to the series: w_i = w_{i−1} + s·(ts_{i−1} −
    w_{i−1}) — reference kernel ``general.py:298-333``."""
    x = np.asarray(ts, dtype=float)
    w = np.empty(x.size)
    w[0] = x.mean() if start_point is None else start_point
    for i in range(1, x.size):
        w[i] = w[i - 1] + step_size * (x[i - 1] - w[i - 1])
    return w


def moving_threshold(ts_scaled: np.ndarray, rate_absorption: float = 0.1,
                     rate_decay: float = 0.1) -> np.ndarray:
    """Decaying threshold absorbing spikes (``general.py:1151-1241``):
    threshold decays each step, jumps to |x| on exceedance."""
    x = np.abs(np.asarray(ts_scaled, dtype=float))
    thr = np.empty(x.size)
    cur = 1.0
    for i, v in enumerate(x):
        if v > cur:
            cur = (1.0 + rate_absorption) * v
        else:
            cur = (1.0 - rate_decay) * cur
        thr[i] = cur
    return thr


# ---------------------------------------------------------------------------
# Rolling / tiled arrays (reference: local_stats.py; numpy oracle forms
# of the SQL-family operators in operators/local_stats.py)
# ---------------------------------------------------------------------------

def _rolling_windows(x: np.ndarray, w: int) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view

    return sliding_window_view(x, w)


def _win_size(n: int, window_size: float = 0.1) -> int:
    """Reference window sizing: 0.1*n forced odd (_utils.py:36-67)."""
    w = max(3, int(np.ceil(window_size * n)))
    if w % 2 == 0:
        w += 1
    return min(w, n if n % 2 == 1 else n - 1)


def moving_stat(ts: np.ndarray, stat: str, window_size: float = 0.1,
                shift: bool = False) -> np.ndarray:
    """Centered rolling statistics on the z-scored series
    (local_stats.py:256-1278): full-frame values only (nan edges
    dropped, local_stats.py:113-173); ``shift`` -> |diff| of the stat."""
    x = np.asarray(ts, dtype=float)
    sd0 = x.std(ddof=0)
    x = (x - x.mean()) / sd0 if sd0 > 0 else x - x.mean()
    w = _win_size(x.size, window_size)
    if x.size < w:
        return np.array([])
    win = _rolling_windows(x, w)
    if stat == "avg":
        out = win.mean(axis=1)
    elif stat == "var":
        out = win.var(axis=1, ddof=1)
    elif stat == "sd":
        out = win.std(axis=1, ddof=1)
    elif stat == "skewness":
        n = w
        mu = win.mean(axis=1, keepdims=True)
        m2 = ((win - mu) ** 2).mean(axis=1)
        m3 = ((win - mu) ** 3).mean(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = m3 / m2**1.5 * ((n - 1) / n) ** 1.5
    elif stat == "kurtosis":
        n = w
        mu = win.mean(axis=1, keepdims=True)
        m2 = ((win - mu) ** 2).mean(axis=1)
        m4 = ((win - mu) ** 4).mean(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = m4 / m2**2 * (1 - 1 / n) ** 2 - 3
    elif stat == "acf":
        # rolling adjusted lag-1 ACF per window (local_stats.py:1031-1086)
        mu = win.mean(axis=1, keepdims=True)
        d = win - mu
        num = (d[:, :-1] * d[:, 1:]).sum(axis=1) / (w - 1)
        den = (d * d).sum(axis=1) / w
        with np.errstate(divide="ignore", invalid="ignore"):
            out = num / den
    elif stat == "gmean":
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(
                (win > 0).all(axis=1),
                np.exp(np.log(np.where(win > 0, win, 1.0)).mean(axis=1)),
                np.nan,
            )
    else:
        raise ValueError(f"unknown moving stat: {stat}")
    if shift:
        out = np.abs(np.diff(out))
    return out


def tiles(ts: np.ndarray, num_tiles: int = 16) -> list[np.ndarray]:
    return np.array_split(np.asarray(ts, dtype=float), num_tiles)


def lumpiness(ts: np.ndarray, num_tiles: int = 16) -> np.ndarray:
    """Tile variances ddof=1 (local_stats.py:1624-1681)."""
    return np.array([t.var(ddof=1) for t in tiles(ts, num_tiles) if t.size > 1])


def stability(ts: np.ndarray, num_tiles: int = 16) -> np.ndarray:
    """Tile means (local_stats.py:1684-1733)."""
    return np.array([t.mean() for t in tiles(ts, num_tiles) if t.size])


def local_extrema(ts: np.ndarray, num_tiles: int = 16) -> np.ndarray:
    """Per-tile max-|v| value (local_stats.py:1736-1788)."""
    return np.array(
        [t[np.argmax(np.abs(t))] for t in tiles(ts, num_tiles) if t.size]
    )


def local_range(ts: np.ndarray, num_tiles: int = 16) -> np.ndarray:
    """Per-tile ptp (local_stats.py:1791-1836)."""
    return np.array([np.ptp(t) for t in tiles(ts, num_tiles) if t.size])


# ---------------------------------------------------------------------------
# General-family kernels (reference: general.py)
# ---------------------------------------------------------------------------

def turning_points_flags(ts: np.ndarray, on_diff: bool = False) -> np.ndarray:
    """(general.py:398-458): binary local-extrema flags."""
    x = np.diff(ts) if on_diff else np.asarray(ts, dtype=float)
    d1, d2 = x[1:-1] - x[:-2], x[2:] - x[1:-1]
    return ((d1 * d2) < 0).astype(float)


def step_changes_flags(ts: np.ndarray, on_diff: bool = False) -> np.ndarray:
    """(general.py:461-543): expanding-window |x−mean|>2sd flags."""
    x = np.diff(ts) if on_diff else np.asarray(ts, dtype=float)
    n = x.size
    out = np.zeros(max(0, n - 2))
    c1 = np.cumsum(x)
    c2 = np.cumsum(x * x)
    for i in range(2, n):
        m = c1[i - 1] / i
        var = (c2[i - 1] - c1[i - 1] ** 2 / i) / (i - 1)
        sd = math.sqrt(var) if var > 0 else 0.0
        out[i - 2] = 1.0 if abs(x[i] - m) > 2 * sd else 0.0
    return out


def stick_angles(ts: np.ndarray) -> np.ndarray:
    """(general.py:1478-1525): arctan of slopes between consecutive
    same-sign observations, both signs concatenated."""
    x = np.asarray(ts, dtype=float)
    n = x.size
    angles = []
    for sign in (x >= 0, x < 0):
        idx = np.flatnonzero(sign)
        if idx.size > 1:
            slopes = (n - 1) * (x[idx[1:]] - x[idx[:-1]]) / (idx[1:] - idx[:-1])
            angles.append(np.arctan(slopes))
    return np.concatenate(angles) if angles else np.array([np.nan])


def spikiness(residuals: np.ndarray) -> np.ndarray:
    """Leave-one-out variances of residuals (global_stats.py:878-925),
    closed form from (n, Σx, Σx²) — O(n), no loop."""
    x = np.asarray(residuals, dtype=float)
    n = x.size
    if n < 3:
        return np.array([np.nan])
    s1, s2 = x.sum(), (x * x).sum()
    s1_i, s2_i = s1 - x, s2 - x * x
    return (s2_i - s1_i * s1_i / (n - 1)) / (n - 2)


def embed_in_shell(ts: np.ndarray, radii=(0.0, 1.0), dim: int = 2,
                   lag: int = 1) -> float:
    """Fraction of Takens-embedded points inside the hypershell
    (general.py:1244-1384), on the z-scored series."""
    x = np.asarray(ts, dtype=float)
    sd = x.std(ddof=0)
    x = (x - x.mean()) / sd if sd > 0 else x - x.mean()
    emb = _embed(x, dim, lag)
    norms = np.sqrt((emb * emb).sum(axis=1))
    lo, hi = radii
    return float(np.mean((norms >= lo) & (norms <= hi)))


def ioe_stats(ts: np.ndarray, func, step_size: float = 0.05,
              max_it: int = 1024, differentiate: bool = False) -> np.ndarray:
    """Iterative-outlier-exclusion statistics (reference
    ``_utils.py:248-350`` calc_ioe_stats): raise an absolute-value
    threshold stepwise; at each step apply ``func`` to the (optionally
    differenced) indices of surviving outliers."""
    x = np.asarray(ts, dtype=float)
    sd = x.std(ddof=0)
    xs = (x - x.mean()) / sd if sd > 0 else x - x.mean()
    ts_abs = np.abs(xs)
    min_abs, max_abs = ts_abs.min(), ts_abs.max()
    step = step_size * ts_abs.std(ddof=0)
    if step <= 0:
        return np.array([np.nan])
    n_it = min(max_it, int(np.ceil(max_abs / step)))
    out = []
    threshold = min_abs
    for _ in range(n_it):
        threshold += step
        steps = np.flatnonzero(ts_abs >= threshold)
        if steps.size <= 1:
            break
        d = np.diff(steps, int(differentiate))
        out.append(func(d))
    return np.asarray(out, dtype=float) if out else np.array([np.nan])


def boxcox_lambda(ts: np.ndarray) -> float:
    """MLE Box-Cox lambda via golden-section search on the profile
    log-likelihood (scipy boxcox_normmax(method='mle') semantics,
    global_stats.py:810-845); data shifted positive first."""
    x = np.asarray(ts, dtype=float)
    x = x - x.min() + 1e-4  # shift to positive (reference behavior)
    n = x.size
    logx = np.log(x)
    slogx = logx.sum()

    def negll(lmb: float) -> float:
        if abs(lmb) < 1e-12:
            y = logx
        else:
            y = (np.power(x, lmb) - 1) / lmb
        var = y.var(ddof=0)
        if var <= 0:
            return np.inf
        return 0.5 * n * math.log(var) - (lmb - 1) * slogx

    lo, hi = -5.0, 5.0
    gr = (math.sqrt(5) - 1) / 2
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = negll(c), negll(d)
    for _ in range(200):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = negll(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = negll(d)
        if abs(b - a) < 1e-10:
            break
    return float((a + b) / 2)


# ---------------------------------------------------------------------------
# Randomize / surrogate family (reference: randomize.py, _surrogates.py)
# Determinism: np.random.seed per call, matching the reference's global
# seeding (tsmfe.py:272-274); engine derives seed per (conv_id, feature)
# ---------------------------------------------------------------------------

def itrand_stat(ts: np.ndarray, func, strategy: str = "dist-dynamic",
                prop_rep: float = 2, prop_interval: float = 0.1,
                random_state: int | None = None) -> np.ndarray:
    """Iterative-perturbation statistic trajectory (randomize.py:174-312)."""
    x = np.asarray(ts, dtype=float)
    sd = x.std(ddof=0)
    xs = (x - x.mean()) / sd if sd > 0 else x - x.mean()
    rep_it = int(np.ceil(prop_interval * xs.size))
    num_it = int(np.ceil(prop_rep * xs.size))
    num_it += num_it % rep_it
    res = np.zeros(1 + num_it // rep_it)
    ts_rnd = np.copy(xs)
    ts_src = xs if strategy == "dist-static" else ts_rnd
    swap = strategy == "permute"
    if random_state is not None:
        np.random.seed(random_state)
    inds = np.random.randint(xs.size, size=(num_it, 2))
    stat_ind = 0
    for it, (a, b) in enumerate(inds):
        if swap:
            ts_rnd[a], ts_src[b] = ts_src[b], ts_rnd[a]
        else:
            ts_rnd[a] = ts_src[b]
        if it % rep_it == 0:
            res[stat_ind] = func(ts_rnd)
            stat_ind += 1
    return res


def iaaft(ts: np.ndarray, max_iter: int = 128, atol: float = 1e-8,
          rtol: float = 1e-10, random_state: int | None = None) -> np.ndarray:
    """IAAFT surrogate (reference ``_surrogates.py:8-82``, itself adapted
    from the public nolitsa package): iterative amplitude-adjusted
    Fourier transform preserving amplitude spectrum + value distribution."""
    x = np.asarray(ts, dtype=float)
    ampl = np.abs(np.fft.rfft(x))
    sort = np.sort(x)
    err_prev, err_cur = -1.0, atol + 1
    if random_state is not None:
        np.random.seed(random_state)
    ts_fft = np.fft.rfft(np.random.permutation(x))
    ts_sur = x
    for _ in range(max_iter):
        s = np.fft.irfft(ampl * ts_fft / (1e-8 + np.abs(ts_fft)), n=x.size).real
        ts_sur = sort[np.argsort(np.argsort(s))]
        ts_fft = np.fft.rfft(ts_sur)
        err_cur = math.sqrt(float(np.mean((ampl**2 - np.abs(ts_fft) ** 2) ** 2)))
        if abs(err_cur - err_prev) <= atol + rtol * abs(err_prev):
            break
        err_prev = err_cur
    return ts_sur


def surrogate_stat(ts: np.ndarray, func, surrogate_num: int = 32,
                   max_iter: int = 128, random_state: int | None = None) -> np.ndarray:
    """Apply ``func`` on IAAFT surrogates; seed increments per replica
    (reference ``_surrogates.py:154-158``)."""
    out = np.zeros(surrogate_num)
    for i in range(surrogate_num):
        seed = None if random_state is None else random_state + i
        out[i] = func(iaaft(ts, max_iter=max_iter, random_state=seed))
    return out


def resample_stat(ts: np.ndarray, func, num_samples: int = 64,
                  sample_frac: float = 0.1,
                  random_state: int | None = None) -> np.ndarray:
    """Statistic over random contiguous subsamples
    (randomize.py:604-761, sampler ``_utils.py:353-415``)."""
    x = np.asarray(ts, dtype=float)
    m = max(2, int(np.ceil(sample_frac * x.size)))
    if random_state is not None:
        np.random.seed(random_state)
    starts = np.random.randint(0, x.size - m + 1, size=num_samples)
    return np.asarray([func(x[s : s + m]) for s in starts], dtype=float)


def trev_stat(ts: np.ndarray, lag: int = 1) -> float:
    d = ts[lag:] - ts[:-lag]
    m2 = np.mean(d**2)
    return float(np.mean(d**3) / m2**1.5) if m2 > 0 else np.nan


def tc3_stat(ts: np.ndarray, lag: int = 1) -> float:
    x = ts[: -2 * lag] if lag > 0 else ts
    x1 = ts[lag : ts.size - lag]
    x2 = ts[2 * lag :]
    den = abs(np.mean(ts[:-lag] * ts[lag:])) ** 1.5
    return float(np.mean(x * x1 * x2) / den) if den > 0 else np.nan
