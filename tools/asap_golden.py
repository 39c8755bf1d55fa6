#!/usr/bin/env python3
"""Independent ASAP implementation -> golden outputs for AsapGoldenSpec.

Re-implements, in Python, the pipeline behind graft's B5 `get_sampled_data`
(the timescaledb_toolkit `asap_smooth` semantics, i.e. Rong & Bailis,
"ASAP: Prioritizing Attention via Time Series Smoothing", VLDB'17):

  1. reduce the raw slice to a regular grid: time_bucket(width, ts) + AVG,
     width = max(1, span/resolution), bucket origin 2000-01-03T00:00:00Z;
  2. linear-interpolate interior missing buckets (regular spacing is an
     ACF precondition);
  3. choose the SMA window among ACF-peak candidates (+1 = no smoothing)
     that minimizes roughness (stddev of first differences) subject to
     preserving kurtosis; series shorter than 8 points are not smoothed;
  4. trailing SMA, stamped at each window's start bucket.

This script shares no code with the Scala implementation — it exists so
`Asap.sampledData` is checked against outputs that are not derived from
itself. Run from the repo root:

    python3 tools/asap_golden.py > src/test/resources/asap_golden.json
"""
import json
import math

BUCKET_ORIGIN = 946857600  # 2000-01-03T00:00:00Z


# ---------------------------------------------------------------- series

def periodic(start):
    """Smooth sine, 20s cadence, 5000s span."""
    return [(start + 20 * i, 10.0 + 5.0 * math.sin(2 * math.pi * (20 * i) / 600.0))
            for i in range(0, 251)]


def spiky(start):
    """Flat baseline with hard spikes every 37th sample, 10s cadence."""
    return [(start + 10 * i, 50.0 if i % 37 == 0 else 1.0 + 0.01 * (i % 7))
            for i in range(0, 501)]


def gappy(start):
    """Sine with whole chunks missing (every 3rd block of 25 samples)."""
    return [(start + 20 * i, 10.0 + 5.0 * math.sin(2 * math.pi * (20 * i) / 900.0))
            for i in range(0, 251) if (i // 25) % 3 != 1]


# ------------------------------------------------------------------ asap

def grid(rows, start, end, resolution):
    width = max(1, (end - start) // resolution)
    buckets = {}
    for t, v in rows:
        if start <= t <= end:
            b = (t - BUCKET_ORIGIN) // width * width + BUCKET_ORIGIN
            buckets.setdefault(b, []).append(v)
    return sorted((b, sum(vs) / len(vs)) for b, vs in buckets.items()), width


def gap_fill(points, width):
    if len(points) < 2:
        return list(points)
    out = []
    for (t0, v0), (t1, v1) in zip(points, points[1:]):
        out.append((t0, v0))
        gap = (t1 - t0) // width
        for g in range(1, gap):
            out.append((t0 + g * width, v0 + (v1 - v0) * g / gap))
    out.append(points[-1])
    return out


def mean(xs):
    return sum(xs) / len(xs)


def kurtosis(xs):
    if len(xs) < 2:
        return 0.0
    m = mean(xs)
    m2 = sum((x - m) ** 2 for x in xs) / len(xs)
    if m2 == 0.0:
        return 0.0
    m4 = sum((x - m) ** 4 for x in xs) / len(xs)
    return m4 / (m2 * m2)


def roughness(xs):
    if len(xs) < 2:
        return 0.0
    d = [xs[i] - xs[i - 1] for i in range(1, len(xs))]
    if len(d) < 2:
        return 0.0
    m = mean(d)
    return math.sqrt(sum((x - m) ** 2 for x in d) / len(d))


def sma(xs, w):
    return [sum(xs[i:i + w]) / w for i in range(len(xs) - w + 1)]


def acf(xs, max_lag):
    n = len(xs)
    m = mean(xs)
    denom = sum((x - m) ** 2 for x in xs)
    out = []
    for lag in range(1, max_lag + 1):
        out.append(0.0 if denom == 0.0 else
                   sum((xs[i] - m) * (xs[i + lag] - m) for i in range(n - lag)) / denom)
    return out


def acf_peaks(corr):
    threshold = max(mean(corr), 0.0) if corr else 0.0
    return [i + 1 for i in range(1, len(corr) - 1)
            if corr[i] > corr[i - 1] and corr[i] >= corr[i + 1] and corr[i] > threshold]


def choose_window(xs):
    if len(xs) < 8:
        return 1
    k0 = kurtosis(xs)
    seen, candidates = set(), []
    for w in acf_peaks(acf(xs, len(xs) // 2)) + [1]:
        if w not in seen and 1 <= w <= max(1, len(xs) // 2):
            seen.add(w)
            candidates.append(w)
    valid = [(w, sma(xs, w)) for w in candidates]
    valid = [(w, s) for w, s in valid if w == 1 or kurtosis(s) >= k0]
    if not valid:
        return 1
    best = min(valid, key=lambda ws: roughness(ws[1]))
    return best[0]


def asap(rows, start, end, resolution):
    points, width = grid(rows, start, end, resolution)
    points = gap_fill(points, width)
    if len(points) <= 2:
        return points
    xs = [v for _, v in points]
    w = choose_window(xs)
    smoothed = sma(xs, w)
    return [(points[i][0], smoothed[i]) for i in range(len(smoothed))]


# ------------------------------------------------------------------ main

def main():
    start = 1704240000  # 2024-01-03T00:00:00Z
    cases = []
    for name, rows in [("periodic", periodic(start)),
                       ("spiky", spiky(start)),
                       ("gappy", gappy(start))]:
        end = start + 5000
        resolution = 50
        expected = asap(rows, start, end, resolution)
        cases.append({
            "name": name,
            "start_s": start,
            "end_s": end,
            "resolution": resolution,
            "rows": [[t, v] for t, v in rows],
            "expected": [[t, v] for t, v in expected],
        })
    print(json.dumps(cases, indent=1))


if __name__ == "__main__":
    main()
