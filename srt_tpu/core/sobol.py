"""Sobol low-discrepancy sampler (Joe–Kuo direction numbers).

The reference loads the public Joe–Kuo ``new-joe-kuo-6.21201`` table and runs
the classic gray-code XOR recursion on the host to jitter the 2-D pixel
position (``Raytracing_n/Raytracing_n.cpp:721-812``; data
``contents/sobol/new-joe-kuo-6.21201``). We implement the same construction —
host-side in numpy, since the (spp, D) point set is tiny, computed once, and
broadcast to every chip — plus optional Owen-style scrambling (an improvement
the reference lacks; off by default for reference parity).

The first 32 dimensions of the Joe–Kuo table are embedded below so the sampler
works without the data file; ``load_direction_numbers`` parses the full file
when deeper dimensions are wanted. (The embedded values are from the public
Joe & Kuo "new-joe-kuo-6" dataset, the same public dataset the reference
vendors.)
"""
from __future__ import annotations

import numpy as np

# (d, s, a, [m_1..m_s]) rows of the public Joe-Kuo new-joe-kuo-6 table,
# dimensions 2..32 (dimension 1 is the van der Corput sequence, all m_i = 1).
_JOE_KUO_HEAD = [
    (2, 1, 0, [1]),
    (3, 2, 1, [1, 3]),
    (4, 3, 1, [1, 3, 1]),
    (5, 3, 2, [1, 1, 1]),
    (6, 4, 1, [1, 1, 3, 3]),
    (7, 4, 4, [1, 3, 5, 13]),
    (8, 5, 2, [1, 1, 5, 5, 17]),
    (9, 5, 4, [1, 1, 5, 5, 5]),
    (10, 5, 7, [1, 1, 7, 11, 19]),
    (11, 5, 11, [1, 1, 5, 1, 1]),
    (12, 5, 13, [1, 1, 1, 3, 11]),
    (13, 5, 14, [1, 3, 5, 5, 31]),
    (14, 6, 1, [1, 3, 3, 9, 7, 49]),
    (15, 6, 13, [1, 1, 1, 15, 21, 21]),
    (16, 6, 16, [1, 3, 1, 13, 27, 49]),
    (17, 6, 19, [1, 1, 1, 15, 7, 5]),
    (18, 6, 22, [1, 3, 1, 15, 13, 25]),
    (19, 6, 25, [1, 1, 5, 5, 19, 61]),
    (20, 7, 1, [1, 3, 7, 11, 23, 15, 103]),
    (21, 7, 4, [1, 3, 7, 13, 13, 15, 69]),
    (22, 7, 7, [1, 1, 3, 13, 7, 35, 63]),
    (23, 7, 8, [1, 3, 5, 9, 1, 25, 53]),
    (24, 7, 14, [1, 3, 1, 13, 9, 35, 107]),
    (25, 7, 19, [1, 3, 1, 5, 27, 61, 31]),
    (26, 7, 21, [1, 1, 5, 11, 19, 41, 61]),
    (27, 7, 28, [1, 3, 5, 3, 3, 13, 69]),
    (28, 7, 31, [1, 1, 7, 13, 1, 19, 1]),
    (29, 7, 32, [1, 3, 7, 5, 13, 19, 59]),
    (30, 7, 37, [1, 1, 3, 9, 25, 29, 41]),
    (31, 7, 41, [1, 3, 5, 13, 23, 1, 55]),
    (32, 7, 42, [1, 3, 7, 3, 13, 59, 17]),
]


def load_direction_numbers(path: str, max_dim: int):
    """Parse a Joe-Kuo direction-number file (same format the reference reads,
    ``Raytracing_n.cpp:775-780``): header line, then ``d s a m_1..m_s`` rows."""
    rows = []
    with open(path, "r") as f:
        f.readline()  # header
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            d, s, a = int(parts[0]), int(parts[1]), int(parts[2])
            m = [int(x) for x in parts[3:3 + s]]
            rows.append((d, s, a, m))
            if d >= max_dim:
                break
    return rows


def _direction_vectors(L: int, s: int, a: int, m: list[int]) -> np.ndarray:
    """V[1..L] scaled by 2^32 for one dimension (Joe-Kuo recursion,
    mirrors the math at ``Raytracing_n.cpp:781-793``)."""
    V = np.zeros(L + 1, dtype=np.uint64)
    if L <= s:
        for i in range(1, L + 1):
            V[i] = np.uint64(m[i - 1]) << np.uint64(32 - i)
    else:
        for i in range(1, s + 1):
            V[i] = np.uint64(m[i - 1]) << np.uint64(32 - i)
        for i in range(s + 1, L + 1):
            V[i] = V[i - s] ^ (V[i - s] >> np.uint64(s))
            for k in range(1, s):
                V[i] ^= np.uint64((a >> (s - 1 - k)) & 1) * V[i - k]
    return V


def sobol_points(n: int, d: int, dir_file: str | None = None,
                 scramble_seed: int | None = None) -> np.ndarray:
    """First ``n`` points of the ``d``-dimensional Sobol sequence, (n, d) f64.

    Gray-code construction identical in output to the reference's
    ``sobol_points`` (``Raytracing_n.cpp:721-812``). If ``scramble_seed`` is
    given, applies a random digital shift (XOR scramble) per dimension — a
    cheap decorrelation the reference does not have.
    """
    if n < 1:
        return np.zeros((0, d))
    L = max(1, int(np.ceil(np.log2(max(n, 2)))))

    # C[i] = index (from 1) of the lowest zero bit of i.
    C = np.ones(n, dtype=np.uint32)
    for i in range(1, n):
        value = i
        while value & 1:
            value >>= 1
            C[i] += 1

    points = np.zeros((n, d))
    X = np.zeros(d, dtype=np.uint64)

    rows = _JOE_KUO_HEAD
    if d > len(rows) + 1:
        if dir_file is None:
            raise ValueError(
                f"sobol dimension {d} > {len(rows) + 1} requires a Joe-Kuo "
                f"direction-number file (dir_file=...)")
        rows = load_direction_numbers(dir_file, max_dim=d)

    # Per-dimension direction vectors; dim 0 is van der Corput: every
    # V[i] = 1 << (32-i), i.e. all m_i = 1 with no recursion (s = L).
    Vs = [_direction_vectors(L, L, 0, [1] * L)]
    for j in range(1, d):
        _, s, a, m = rows[j - 1]
        Vs.append(_direction_vectors(L, s, a, m))

    shift = np.zeros(d, dtype=np.uint64)
    if scramble_seed is not None:
        rng = np.random.default_rng(scramble_seed)
        shift = rng.integers(0, 1 << 32, size=d, dtype=np.uint64)

    inv = 1.0 / float(1 << 32)
    points[0] = (shift * inv)
    for i in range(1, n):
        for j in range(d):
            X[j] ^= Vs[j][C[i - 1]]
            points[i, j] = float(X[j] ^ shift[j]) * inv
    return points
