"""CPU MSM oracles: naive, Pippenger, and the full cuZK pipeline model.

These mirror, in order:
- naive double-and-add MSM: the ground truth every engine is checked
  against (the role of the Aleo WASM `Address.bls12_377_msm`,
  src/reference/reference.ts:18-29)
- Pippenger bucket method: src/reference/webgpu/entries/pippengerMSMEntry.ts
- cuZK pipeline model: signed decomposition -> CSR transpose -> SMVP ->
  bucket points reduction -> Horner, mirroring
  src/submission/implementation/cuzk/{transpose,smvp,bpr}.ts and the
  miniature pipeline test in src/submission/miscellaneous/tests/cuzk.test.ts.

All functions are generic over a "group" (a small vtable of zero/add/
double/neg/scalar_mult) so the same model verifies both curves.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

from . import curve as crv
from .limbs import decompose_scalars_signed


@dataclass(frozen=True)
class Group:
    """Abstract group ops used by the generic MSM models."""

    zero: Any
    add: Callable[[Any, Any], Any]
    neg: Callable[[Any], Any]
    scalar_mult: Callable[[Any, int], Any]
    eq: Callable[[Any, Any], bool]


G1 = Group(
    zero=crv.G1_ZERO,
    add=crv.g1_add,
    neg=crv.g1_neg,
    scalar_mult=crv.g1_scalar_mult,
    eq=crv.g1_eq,
)

EDWARDS = Group(
    zero=crv.ED_ZERO,
    add=crv.ed_add,
    neg=crv.ed_neg,
    scalar_mult=crv.ed_scalar_mult,
    eq=crv.ed_eq,
)


def naive_msm(points: Sequence[Any], scalars: Sequence[int], group: Group = G1):
    """Ground-truth sum of k_i * P_i."""
    acc = group.zero
    for pt, k in zip(points, scalars):
        acc = group.add(acc, group.scalar_mult(pt, k))
    return acc


def pippenger_msm(
    points: Sequence[Any],
    scalars: Sequence[int],
    chunk_size: int = 16,
    num_bits: int = 256,
    group: Group = G1,
):
    """Classic (unsigned) Pippenger bucket method.

    Mirrors the CPU half of pippengerMSMEntry.ts:75-168: bucket per window,
    running-sum per window, Horner across windows.
    """
    num_windows = -(-num_bits // chunk_size)
    mask = (1 << chunk_size) - 1
    window_sums = []
    for w in range(num_windows):
        buckets: dict[int, Any] = {}
        for pt, k in zip(points, scalars):
            digit = (k >> (w * chunk_size)) & mask
            if digit == 0:
                continue
            buckets[digit] = group.add(buckets.get(digit, group.zero), pt)
        # running sum over buckets from the top index down
        running = group.zero
        total = group.zero
        for b in range(max(buckets.keys(), default=0), 0, -1):
            if b in buckets:
                running = group.add(running, buckets[b])
            total = group.add(total, running)
        window_sums.append(total)
    result = window_sums[-1]
    m = 1 << chunk_size
    for w in range(num_windows - 2, -1, -1):
        result = group.scalar_mult(result, m)
        result = group.add(result, window_sums[w])
    return result


# ---------------------------------------------------------------------------
# cuZK pipeline model (the spec for the device pipeline)
# ---------------------------------------------------------------------------


def calc_start_end(m: int, n: int, i: int) -> tuple[int, int]:
    """Row extent in the implicit uniform CSR row_ptr (transpose.ts:1-7)."""
    if i < m:
        return i * n, i * n + n
    return m * n, m * n


def cpu_transpose(
    all_csr_col_idx: Sequence[int],
    n: int,
    m: int,
    num_subtasks: int,
    input_size: int,
) -> tuple[list[int], list[int], list[int]]:
    """Serial per-subtask CSR->CSC transpose (transpose.ts:14-62).

    Returns (all_csc_col_ptr, all_csc_row_idx, all_csc_vals).
    """
    all_csc_col_ptr = [0] * (num_subtasks * (n + 1))
    all_csc_row_idx = [0] * (num_subtasks * input_size)
    all_csc_vals = [0] * (num_subtasks * input_size)
    all_curr = [0] * (num_subtasks * n)

    for subtask_idx in range(num_subtasks):
        ccp = subtask_idx * (n + 1)
        cci = subtask_idx * input_size
        cur = subtask_idx * n

        for i in range(m):
            start, end = calc_start_end(m, n, i)
            for j in range(start, min(end, input_size)):
                all_csc_col_ptr[ccp + all_csr_col_idx[cci + j] + 1] += 1

        for i in range(1, n + 1):
            all_csc_col_ptr[ccp + i] += all_csc_col_ptr[ccp + i - 1]

        val = 0
        for i in range(m):
            start, end = calc_start_end(m, n, i)
            for j in range(start, min(end, input_size)):
                col = all_csr_col_idx[cci + j]
                loc = all_csc_col_ptr[ccp + col] + all_curr[cur + col]
                all_curr[cur + col] += 1
                all_csc_row_idx[cci + loc] = i
                all_csc_vals[cci + loc] = val
                val += 1

    return all_csc_col_ptr, all_csc_row_idx, all_csc_vals


def cpu_smvp_signed(
    subtask_idx: int,
    input_size: int,
    num_columns: int,
    all_csc_col_ptr: Sequence[int],
    all_csc_val_idxs: Sequence[int],
    points: Sequence[Any],
    group: Group = G1,
) -> list[Any]:
    """Signed-index bucket accumulation (smvp.ts:5-67).

    Each simulated thread handles two CSC rows (h+t and h-t) and accumulates
    into its unique bucket slot; the recovered signed digit's sign negates
    the row sum.
    """
    l = num_columns
    h = l // 2
    zero = group.zero
    buckets = [zero] * (num_columns // 2)
    rp_offset = subtask_idx * (num_columns + 1)

    for thread_id in range(num_columns // 2):
        for j in range(2):
            row_idx = thread_id + h
            if j == 1:
                row_idx = h - thread_id
            if thread_id == 0 and j == 0:
                row_idx = 0

            row_begin = all_csc_col_ptr[rp_offset + row_idx]
            row_end = all_csc_col_ptr[rp_offset + row_idx + 1]

            s = zero
            for k in range(row_begin, row_end):
                s = group.add(
                    s, points[all_csc_val_idxs[subtask_idx * input_size + k]]
                )

            if h > row_idx:
                s = group.neg(s)

            bucket_idx = abs(row_idx - h)
            if bucket_idx > 0:
                buckets[thread_id] = group.add(buckets[thread_id], s)

    return buckets


def cpu_smtvp(
    row_ptr: Sequence[int],
    col_idx: Sequence[int],
    points: Sequence[Any],
    num_cols: int,
    group: Group = G1,
) -> list:
    """Sparse-matrix-TRANSPOSE vector product with an all-ones vector
    (the reference's exploratory pre-cuZK stage-3 variant,
    smtvp.template.wgsl:43-59): y[col_idx[j]] += points[j] for every
    entry j of every CSR row — bucket accumulation WITHOUT an explicit
    transpose, at the cost of a serial output-scatter loop (which is
    why the production pipeline transposes first; README.md:195-226).
    """
    out = [group.zero] * num_cols
    for i in range(len(row_ptr) - 1):
        for j in range(row_ptr[i], row_ptr[i + 1]):
            c = col_idx[j]
            out[c] = group.add(out[c], points[j])
    return out


def running_sum_bucket_reduction(buckets: Sequence[Any], group: Group = G1):
    """Serial running-sum reduction (bpr.ts:5-26).

    Computes sum_{i>=1} i * buckets[i] + n * buckets[0] -- note the
    reference treats buckets[0] as the highest bucket (index n), matching
    how SMVP stores bucket h (=l/2, i.e. digit -2^(s-1) recovered as +2^15
    ... slot 0).
    """
    n = len(buckets)
    m = buckets[0]
    g = m
    for i in range(n - 1):
        idx = n - 1 - i
        m = group.add(m, buckets[idx])
        g = group.add(g, m)
    return g


def parallel_bucket_reduction_1(
    buckets: Sequence[Any], num_threads: int = 4, group: Group = G1
) -> tuple[list[Any], list[Any]]:
    """Stage 1 of the parallel running-sum reduction (bpr.ts:72-105)."""
    buckets_per_thread = len(buckets) // num_threads
    g_points, m_points = [], []
    for thread_id in range(num_threads):
        idx = 0 if thread_id == 0 else (num_threads - thread_id) * buckets_per_thread
        m = buckets[idx]
        g = m
        for i in range(buckets_per_thread - 1):
            idx = (num_threads - thread_id) * buckets_per_thread - 1 - i
            m = group.add(m, buckets[idx])
            g = group.add(g, m)
        g_points.append(g)
        m_points.append(m)
    return g_points, m_points


def parallel_bucket_reduction_2(
    g_points: Sequence[Any],
    m_points: Sequence[Any],
    num_buckets: int,
    num_threads: int = 4,
    group: Group = G1,
) -> list[Any]:
    """Stage 2: g += m * s fixup (bpr.ts:108-126)."""
    buckets_per_thread = num_buckets // num_threads
    result = []
    for thread_id in range(num_threads):
        g = g_points[thread_id]
        m = m_points[thread_id]
        s = buckets_per_thread * (num_threads - thread_id - 1)
        if s > 0:
            g = group.add(g, group.scalar_mult(m, s))
        result.append(g)
    return result


def horner(window_sums: Sequence[Any], chunk_size: int, group: Group = G1):
    """Final Horner aggregation (submission.ts:310-318)."""
    m = 1 << chunk_size
    result = window_sums[-1]
    for i in range(len(window_sums) - 2, -1, -1):
        result = group.scalar_mult(result, m)
        result = group.add(result, window_sums[i])
    return result


def cuzk_msm(
    points: Sequence[Any],
    scalars: Sequence[int],
    chunk_size: int,
    num_bits: int = 256,
    bpr_threads: int = 4,
    group: Group = G1,
):
    """Full cuZK pipeline model, mirroring compute_msm (submission.ts:85-327)
    and the miniature test (cuzk.test.ts).

    The digits produced by decompose_scalars_signed are stored shifted
    (+2^(s-1)) and play the role of CSR column indices.
    """
    input_size = len(points)
    num_columns = 1 << chunk_size
    num_rows = -(-input_size // num_columns)
    num_subtasks = -(-num_bits // chunk_size)

    decomposed = decompose_scalars_signed(scalars, num_subtasks, chunk_size)
    all_csr_col_idx: list[int] = []
    for subtask in decomposed:
        all_csr_col_idx.extend(subtask)

    all_csc_col_ptr, _, all_csc_vals = cpu_transpose(
        all_csr_col_idx, num_columns, num_rows, num_subtasks, input_size
    )

    window_sums = []
    for subtask_idx in range(num_subtasks):
        buckets = cpu_smvp_signed(
            subtask_idx,
            input_size,
            num_columns,
            all_csc_col_ptr,
            all_csc_vals,
            points,
            group,
        )
        g_points, m_points = parallel_bucket_reduction_1(
            buckets, bpr_threads, group
        )
        reduced = parallel_bucket_reduction_2(
            g_points, m_points, len(buckets), bpr_threads, group
        )
        acc = group.zero
        for pt in reduced:
            acc = group.add(acc, pt)
        window_sums.append(acc)

    return horner(window_sums, chunk_size, group)
