"""FASTA streaming for batched TPU hashing.

The reference's tools read FASTA by accumulating sequence lines per record
(/root/reference/swig/writeBloom_rolling.cpp:22-60 and
/root/reference/Tests/AdHoc/ParallelFilter.cpp:109-122). Here records are
packed into fixed-shape, N-padded code batches: padding is the N code, so
windows that touch padding are invalid under the hasher's N-mask — exactly
the per-read iteration semantics, with no host-side window bookkeeping.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Tuple

import numpy as np

from ..ops import nthash_tables


def read_fasta(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (header, sequence) records from a FASTA file."""
    header = None
    chunks: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if header is not None and chunks:
                    yield header, "".join(chunks)
                header = line[1:]
                chunks = []
            elif line:
                chunks.append(line)
    if header is not None and chunks:
        yield header, "".join(chunks)


@dataclasses.dataclass
class CodeBatch:
    """A fixed-shape batch of encoded reads, N-padded."""

    codes: np.ndarray          # uint8 [B, L]
    lengths: np.ndarray        # int32 [B] true lengths
    headers: List[str]


def batch_records(records, batch_size: int, pad_to: int,
                  k: int) -> Iterator[CodeBatch]:
    """Pack records into [batch_size, pad_to] code arrays.

    Reads longer than ``pad_to`` are split into chunks overlapping by k-1
    bases so every window of the original read appears in exactly one chunk.
    """
    if pad_to < k:
        raise ValueError("pad_to must be >= k")
    buf_codes: List[np.ndarray] = []
    buf_len: List[int] = []
    buf_hdr: List[str] = []

    def flush():
        nonlocal buf_codes, buf_len, buf_hdr
        if not buf_codes:
            return None
        b = len(buf_codes)
        out = np.full((batch_size, pad_to), nthash_tables.CODE_N,
                      dtype=np.uint8)
        for i, c in enumerate(buf_codes):
            out[i, : len(c)] = c
        batch = CodeBatch(out, np.asarray(buf_len + [0] * (batch_size - b),
                                          np.int32), list(buf_hdr))
        buf_codes, buf_len, buf_hdr = [], [], []
        return batch

    step = pad_to - (k - 1)
    for header, seq in records:
        codes = nthash_tables.encode_seq(seq)
        for start in range(0, max(1, len(codes) - (k - 1)), step):
            chunk = codes[start: start + pad_to]
            if len(chunk) < k:
                continue
            buf_codes.append(chunk)
            buf_len.append(len(chunk))
            buf_hdr.append(header)
            if len(buf_codes) == batch_size:
                out = flush()
                if out is not None:
                    yield out
    out = flush()
    if out is not None:
        yield out


def batch_fasta(path: str, batch_size: int, pad_to: int,
                k: int) -> Iterator[CodeBatch]:
    return batch_records(read_fasta(path), batch_size, pad_to, k)
