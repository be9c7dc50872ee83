"""Sorted-array sketch algebra: the binary/unary ops of the reference's
``KmerMinHash`` re-expressed as numpy kernels over sorted uint64 arrays.

Semantics ported (by behavior, not code) from
``/root/reference/src/core/src/sketch/minhash.rs`` and
``/root/reference/src/sourmash/minhash.py``; each function cites its source.
All inputs/outputs keep the sorted-ascending ``mins`` invariant
(``minhash.rs:159-171``).
"""

from __future__ import annotations

import math

import numpy as np

from .sketch import SketchParams, Sketch, max_hash_for_scaled

# ---------------------------------------------------------------------------
# intersection / union primitives (sorted arrays)
# ---------------------------------------------------------------------------


def intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Common values of two sorted-unique uint64 arrays
    (``minhash.rs:539-558`` two-pointer scan, as a vectorized kernel)."""
    return np.intersect1d(a, b, assume_unique=True)


def union_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.union1d(a, b)


def intersection_size_scaled(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """(common, union) sizes for scaled sketches (``minhash.rs:586-588``)."""
    common = int(np.intersect1d(a, b, assume_unique=True).size)
    union = int(a.size + b.size - common)
    return common, union


def intersection_size_num(a: np.ndarray, b: np.ndarray, num: int) -> tuple[int, int]:
    """num-mode (bottom-k) estimator (``minhash.rs:593-621``):

    the denominator is the *combined* bottom-num union (merge both, keep the
    ``num`` smallest), and the numerator counts common hashes that survive in
    that combined set. This is the classic bottom-k Jaccard estimator and is
    NOT plain set jaccard (SURVEY.md §7.5 item 2).
    """
    combined = np.union1d(a, b)[:num]
    common = np.intersect1d(a, b, assume_unique=True)
    common_in_combined = np.intersect1d(common, combined, assume_unique=True)
    return int(common_in_combined.size), int(combined.size)


def jaccard(sa: Sketch, sb: Sketch) -> float:
    """``minhash.rs:624-631``: common / max(1, denom)."""
    check_compatible(sa, sb)
    if sa.params.num:
        common, denom = intersection_size_num(sa.mins, sb.mins, sa.params.num)
    else:
        common, denom = intersection_size_scaled(sa.mins, sb.mins)
    return common / max(1, denom)


def check_compatible(sa: Sketch, sb: Sketch) -> None:
    """``minhash.rs:886-912``: ops only defined for equal
    (ksize, max_hash/num, seed, normalization)."""
    pa, pb = sa.params, sb.params
    if (pa.ksize, pa.scaled, pa.num, pa.seed, pa.normalization) != (
        pb.ksize, pb.scaled, pb.num, pb.seed, pb.normalization
    ):
        raise ValueError(
            f"mismatch in sketch params: {pa} vs {pb} "
            "(downsample explicitly first — minhash.py:664-719)"
        )


def count_common(sa: Sketch, sb: Sketch, downsample: bool = False) -> int:
    """``minhash.py:641-647``."""
    if downsample and sa.params.scaled and sa.params.scaled != sb.params.scaled:
        s = max(sa.params.scaled, sb.params.scaled)
        sa, sb = downsample_scaled(sa, s), downsample_scaled(sb, s)
    check_compatible(sa, sb)
    return int(np.intersect1d(sa.mins, sb.mins, assume_unique=True).size)


def _bias_factor(denom: int, scaled: int) -> float:
    """``minhash.py:833``: 1 - (1 - 1/scaled)^(denom*scaled)."""
    return 1.0 - (1.0 - 1.0 / scaled) ** float(denom * scaled)


def contained_by(sa: Sketch, sb: Sketch, downsample: bool = False) -> float:
    """Fraction of ``sa`` contained in ``sb`` with the debiasing factor,
    clamped to [0, 1] (``minhash.py:819-841``). Scaled-mode only."""
    if not (sa.params.scaled and sb.params.scaled):
        raise TypeError("containment requires scaled sketches")
    denom = len(sa)
    if not denom:
        return 0.0
    c = count_common(sa, sb, downsample) / (denom * _bias_factor(denom, sa.params.scaled))
    return min(1.0, max(0.0, c))


def max_containment(sa: Sketch, sb: Sketch, downsample: bool = False) -> float:
    """``minhash.py:881-905``."""
    if not (sa.params.scaled and sb.params.scaled):
        raise TypeError("containment requires scaled sketches")
    min_denom = min(len(sa), len(sb))
    if not min_denom:
        return 0.0
    c = count_common(sa, sb, downsample) / (
        min_denom * _bias_factor(min_denom, sa.params.scaled)
    )
    return min(1.0, max(0.0, c))


def avg_containment(sa: Sketch, sb: Sketch, downsample: bool = False) -> float:
    """``minhash.py:946-959`` — average of the two containments."""
    return (contained_by(sa, sb, downsample) + contained_by(sb, sa, downsample)) / 2


def angular_similarity(sa: Sketch, sb: Sketch) -> float:
    """Abundance cosine mapped to 1 - 2*acos(cos)/pi
    (``minhash.rs:635-680``)."""
    check_compatible(sa, sb)
    if sa.abunds is None or sb.abunds is None:
        raise ValueError("angular_similarity needs abundance tracking")
    common, ia, ib = np.intersect1d(
        sa.mins, sb.mins, assume_unique=True, return_indices=True
    )
    prod = float(np.dot(sa.abunds[ia].astype(np.float64),
                        sb.abunds[ib].astype(np.float64)))
    norm_a = math.sqrt(float(np.dot(sa.abunds.astype(np.float64),
                                    sa.abunds.astype(np.float64))))
    norm_b = math.sqrt(float(np.dot(sb.abunds.astype(np.float64),
                                    sb.abunds.astype(np.float64))))
    if norm_a == 0.0 or norm_b == 0.0:
        return 0.0
    cos = min(prod / (norm_a * norm_b), 1.0)
    return 1.0 - (2.0 * math.acos(cos) / math.pi)


def similarity(sa: Sketch, sb: Sketch, ignore_abundance: bool = False,
               downsample: bool = False) -> float:
    """Dispatch per ``minhash.rs:682-702``: jaccard unless both track
    abundance and it is not ignored."""
    if downsample and sa.params.scaled != sb.params.scaled:
        s = max(sa.params.scaled, sb.params.scaled)
        sa, sb = downsample_scaled(sa, s), downsample_scaled(sb, s)
    if ignore_abundance or sa.abunds is None or sb.abunds is None:
        return jaccard(sa, sb)
    return angular_similarity(sa, sb)


# ---------------------------------------------------------------------------
# unary transforms
# ---------------------------------------------------------------------------


def downsample_scaled(s: Sketch, new_scaled: int) -> Sketch:
    """Scaled may only increase (``minhash.py:678-700``,
    ``minhash.rs:777-798``)."""
    if not s.params.scaled:
        raise ValueError("cannot downsample a num sketch with scaled=")
    if new_scaled < s.params.scaled:
        raise ValueError(
            f"new scaled {new_scaled} is lower than current sample scaled "
            f"{s.params.scaled}"
        )
    if new_scaled == s.params.scaled:
        return s
    new_params = SketchParams(
        ksize=s.params.ksize, scaled=new_scaled, num=0, seed=s.params.seed,
        track_abundance=s.params.track_abundance,
        normalization=s.params.normalization,
    )
    mask = s.mins <= np.uint64(max_hash_for_scaled(new_scaled))
    return Sketch(
        mins=s.mins[mask],
        abunds=None if s.abunds is None else s.abunds[mask],
        params=new_params, n_kmers=s.n_kmers, name=s.name,
    )


def downsample_num(s: Sketch, new_num: int) -> Sketch:
    """num may only decrease (``minhash.py:678-700``)."""
    if not s.params.num:
        raise ValueError("cannot downsample a scaled sketch with num=")
    if new_num > s.params.num:
        raise ValueError(f"new num {new_num} exceeds current num {s.params.num}")
    new_params = SketchParams(
        ksize=s.params.ksize, scaled=0, num=new_num, seed=s.params.seed,
        track_abundance=s.params.track_abundance,
        normalization=s.params.normalization,
    )
    return Sketch(
        mins=s.mins[:new_num],
        abunds=None if s.abunds is None else s.abunds[:new_num],
        params=new_params, n_kmers=s.n_kmers, name=s.name,
    )


def flatten(s: Sketch) -> Sketch:
    """Drop abundances (``minhash.py:721-738``)."""
    if s.abunds is None and not s.params.track_abundance:
        return s
    new_params = SketchParams(
        ksize=s.params.ksize, scaled=s.params.scaled, num=s.params.num,
        seed=s.params.seed, track_abundance=False,
        normalization=s.params.normalization,
    )
    return Sketch(mins=s.mins, abunds=None, params=new_params,
                  n_kmers=s.n_kmers, name=s.name)


def inflate(s: Sketch, frm: Sketch) -> Sketch:
    """Borrow abundances from ``frm``; implicit intersection
    (``minhash.py:1071-1091``, ``minhash.rs:800-829``)."""
    if frm.abunds is None:
        raise ValueError("inflate source must track abundance")
    common, ia, ib = np.intersect1d(
        s.mins, frm.mins, assume_unique=True, return_indices=True
    )
    new_params = SketchParams(
        ksize=s.params.ksize, scaled=s.params.scaled, num=s.params.num,
        seed=s.params.seed, track_abundance=True,
        normalization=s.params.normalization,
    )
    return Sketch(mins=common, abunds=frm.abunds[ib], params=new_params,
                  n_kmers=s.n_kmers, name=s.name)


# ---------------------------------------------------------------------------
# binary set ops
# ---------------------------------------------------------------------------


def merge(sa: Sketch, sb: Sketch) -> Sketch:
    """Union; abundances summed; truncate to num (``minhash.rs:432-516``)."""
    check_compatible(sa, sb)
    if sa.abunds is not None and sb.abunds is not None:
        allm = np.concatenate([sa.mins, sb.mins])
        alla = np.concatenate([sa.abunds, sb.abunds])
        order = np.argsort(allm, kind="stable")
        allm, alla = allm[order], alla[order]
        uniq, idx = np.unique(allm, return_index=True)
        sums = np.add.reduceat(alla, idx)
        mins, abunds = uniq, sums.astype(np.uint64)
    else:
        mins = np.union1d(sa.mins, sb.mins)
        abunds = None
    if sa.params.num:
        mins = mins[: sa.params.num]
        if abunds is not None:
            abunds = abunds[: sa.params.num]
    return Sketch(mins=mins, abunds=abunds, params=sa.params,
                  n_kmers=sa.n_kmers + sb.n_kmers, name=sa.name)


def intersection(sa: Sketch, sb: Sketch) -> tuple[np.ndarray, int]:
    """(common, denom-size) per ``minhash.rs:560-589``. In num mode the
    common hashes are additionally restricted to the combined bottom-num."""
    check_compatible(sa, sb)
    common = np.intersect1d(sa.mins, sb.mins, assume_unique=True)
    if sa.params.num:
        combined = np.union1d(sa.mins, sb.mins)[: sa.params.num]
        common = np.intersect1d(common, combined, assume_unique=True)
        return common, int(combined.size)
    union = int(sa.mins.size + sb.mins.size - common.size)
    return common, union


def subtract(sa: Sketch, sb: Sketch) -> Sketch:
    """Set difference a - b (``minhash.rs:406-430`` remove_many)."""
    check_compatible(sa, sb)
    keep = ~np.isin(sa.mins, sb.mins, assume_unique=True)
    return Sketch(
        mins=sa.mins[keep],
        abunds=None if sa.abunds is None else sa.abunds[keep],
        params=sa.params, n_kmers=sa.n_kmers, name=sa.name,
    )


# ---------------------------------------------------------------------------
# abundance stats + ANI point estimates
# ---------------------------------------------------------------------------


def abundance_stats(s: Sketch) -> dict:
    """``minhash.py:1093-1127``."""
    if s.abunds is None or s.abunds.size == 0:
        return dict(sum_abundance=0, mean_abundance=0.0, median_abundance=0.0,
                    std_abundance=0.0)
    a = s.abunds.astype(np.float64)
    return dict(
        sum_abundance=int(a.sum()),
        mean_abundance=float(a.mean()),
        median_abundance=float(np.median(a)),
        std_abundance=float(a.std()),
    )


def unique_dataset_hashes(s: Sketch) -> int:
    """``minhash.py:1118-1127``: len * scaled estimate of set size."""
    if not s.params.scaled:
        raise ValueError("requires scaled sketch")
    return len(s) * s.params.scaled


def size_is_accurate(s: Sketch, relative_error: float = 0.2,
                     confidence: float = 0.95) -> bool:
    """Chernoff-bound check (``minhash.py:1129-1149``,
    ``distance_utils.py:181-190``)."""
    if not s.params.scaled:
        raise ValueError("requires scaled sketch")
    set_size = len(s) * s.params.scaled
    prob = 1 - 2 * math.exp(
        -(relative_error ** 2) * set_size / (s.params.scaled * 3)
    )
    return prob >= confidence


def containment_to_ani(containment: float, ksize: int) -> float:
    """Point estimate of ANI = 1 - distance
    (``distance_utils.py:258-296``: dist = 1 - c^(1/k))."""
    if containment <= 0:
        return 0.0
    if containment >= 1:
        return 1.0
    return containment ** (1.0 / ksize)


def jaccard_to_ani(jaccard_v: float, ksize: int) -> float:
    """Point estimate (``distance_utils.py:369-407``:
    dist = 1 - (2j/(1+j))^(1/k))."""
    if jaccard_v <= 0:
        return 0.0
    if jaccard_v >= 1:
        return 1.0
    return (2.0 * jaccard_v / (1.0 + jaccard_v)) ** (1.0 / ksize)


def as_hll(s: Sketch, error_rate: float = 0.01) -> np.ndarray:
    """Convert a sketch's mins into an HLL register array
    (``minhash.rs:759-767``: with_error_rate(0.01) + add every min).
    Mergeable with :func:`sourmash_ray.functions.hll.hll_merge`;
    cardinality via :func:`...hll.hll_cardinality`."""
    from .hll import hll_add_hashes, hll_empty, hll_p_for_error

    regs = hll_empty(hll_p_for_error(error_rate))
    if len(s.mins):
        hll_add_hashes(regs, np.asarray(s.mins, np.uint64))
    return regs


def format_bp(bp) -> str:
    """Pretty-print bp counts (``search.py:667-678`` exactly)."""
    bp = float(bp)
    if bp < 500:
        return f"{bp:.0f} bp"
    if bp <= 500e3:
        return f"{round(bp / 1e3, 1):.1f} kbp"
    if bp < 500e6:
        return f"{round(bp / 1e6, 1):.1f} Mbp"
    if bp < 500e9:
        return f"{round(bp / 1e9, 1):.1f} Gbp"
    return "???"
