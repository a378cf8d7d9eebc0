"""Perl binding smoke test (SURVEY §2 swig row; BloomFilter.i:17-39).

Runs swig/test.pl, which drives swig/BloomFilter.pm ->
swig/bridge_server.py -> compat.KmerBloomFilter: de-novo build,
contains, store/load round trip, getters, insertSeq. The .bf file the
Perl surface writes is the same byte-exact format the C++ reference
loads (tests/test_filters.py golden checks)."""

import os
import shutil
import subprocess

import pytest

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("perl") is None, reason="perl not found")
def test_perl_smoke():
    r = subprocess.run(
        ["perl", os.path.join(_DIR, "swig", "test.pl")],
        capture_output=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    out = r.stdout.decode()
    assert r.returncode == 0, out + r.stderr.decode()[-2000:]
    assert "Done!" in out
    assert "FAIL" not in out
