"""Native FASTA loader vs the pure-python batching (must agree on the set
of valid windows)."""

import numpy as np
import pytest

from btl_bloomfilter_tpu import native
from btl_bloomfilter_tpu.io import fasta
from btl_bloomfilter_tpu.ops import nthash_tables

from util import golden_long_seq


def windows_of(codes_rows, k):
    """Set of valid (N-free) window code-tuples across batch rows."""
    out = []
    for row in codes_rows:
        for i in range(len(row) - k + 1):
            w = row[i:i + k]
            if (w < 4).all():
                out.append(tuple(w.tolist()))
    return out


@pytest.fixture
def fasta_file(tmp_path):
    seqs = [
        golden_long_seq(300),            # multi-line record
        "ACGTNNACGTACGTTGCANCGT",        # Ns
        "acgtACGTacgtTTGG",              # lowercase
        "ACG",                           # shorter than k
        golden_long_seq(300)[:97],
    ]
    p = tmp_path / "t.fa"
    with open(p, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i} header text\n")
            # wrap at 60 chars like real FASTA
            for j in range(0, len(s), 60):
                f.write(s[j:j + 60] + "\n")
    return str(p), seqs


@pytest.mark.parametrize("pad", [64, 128, 333])
def test_native_matches_python(fasta_file, pad):
    path, seqs = fasta_file
    k = 15

    py_batches = [b.codes for b in fasta.batch_fasta(path, 8, pad, k)]
    py_windows = sorted(windows_of(np.concatenate(py_batches), k))

    nat_rows = []
    for arr in native.FastaReader(path, 8, pad, k):
        nat_rows.append(arr)
    nat_windows = sorted(windows_of(np.concatenate(nat_rows), k))

    # ground truth from the raw sequences
    truth = []
    for s in seqs:
        codes = nthash_tables.encode_seq(s)
        truth.extend(windows_of([codes], k))
    truth = sorted(truth)

    assert nat_windows == truth
    assert py_windows == truth


def test_native_encode_matches_table():
    s = "ACGTUacgtuNnXx->0"
    np.testing.assert_array_equal(native.encode_ascii(s),
                                  nthash_tables.encode_seq(s))


def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        native.FastaReader("/nonexistent/x.fa", 4, 64, 5)
