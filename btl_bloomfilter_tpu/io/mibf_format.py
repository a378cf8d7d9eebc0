"""MIBF two-file persistence (main file + .sdsl sidecar).

Mirrors MIBloomFilter::store/load (MIBloomFilter.hpp:149-305, 722-742):

  main file:  packed FileHeader {char magic[8]="MIBLOOMF"; uint32 hlen;
              uint64 size (data length); uint32 nhash; uint32 kmer;
              uint32 version=1}   (#pragma pack(1), MIBloomFilter.hpp:107)
              then each spaced-seed string (kmer bytes each),
              then the raw little-endian data array (size * sizeof(T));
  <path>.sdsl: the interleaved bit vector (io.sdsl reconstruction).
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from . import sdsl as sdsl_io

MAGIC = b"MIBLOOMF"
VERSION = 1
_HEADER_FMT = "<8sIQIII"  # magic, hlen, size, nhash, kmer, version
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
assert _HEADER_SIZE == 32

_NP_LE = {1: "<u1", 2: "<u2", 4: "<u4"}


def store_mibf(m, path: str) -> None:
    from ..models.mibf import MIBloomFilter  # noqa: F401 (doc reference)

    hlen = _HEADER_SIZE + m.kmer_size * len(m.sseeds)
    header = struct.pack(_HEADER_FMT, MAGIC, hlen, m.d_size, m.hash_num,
                         m.kmer_size, VERSION)
    with open(path, "wb") as f:
        f.write(header)
        for s in m.sseeds:
            if len(s) != m.kmer_size:
                raise ValueError("spaced seed length != kmer size")
            f.write(s.encode("ascii"))
        if m.data_width == 8:
            # dual uint32 planes -> raw little-endian uint64 stream
            planes = np.asarray(m.data)
            vals = (planes[0].astype("<u8")
                    | (planes[1].astype("<u8") << np.uint64(32)))
            f.write(vals.tobytes())
        else:
            f.write(np.asarray(m.data).astype(
                _NP_LE[m.data_width]).tobytes())
    with open(path + ".sdsl", "wb") as f:
        f.write(sdsl_io.serialize_bit_vector_il(
            np.asarray(m.bv_words), m.size))


def load_mibf(path: str, data_width: int = 2):
    import jax.numpy as jnp

    from ..models import mibf as mibf_mod

    with open(path, "rb") as f:
        raw = f.read()
    magic, hlen, d_size, nhash, kmer, version = struct.unpack_from(
        _HEADER_FMT, raw, 0)
    if magic != MAGIC:
        raise ValueError("Bloom Filter type does not match")
    if version != VERSION:
        raise ValueError(
            f"Multi Index Bloom Filter version does not match: {version} "
            f"expected: {VERSION}")
    off = _HEADER_SIZE
    sseeds = []
    nseeds = (hlen - _HEADER_SIZE) // kmer if kmer else 0
    for _ in range(nseeds):
        sseeds.append(raw[off: off + kmer].decode("ascii"))
        off += kmer
    if hlen != _HEADER_SIZE + kmer * len(sseeds):
        raise ValueError("header length mismatch (likely version mismatch)")
    body = raw[off:]
    if len(body) != d_size * data_width:
        raise ValueError(
            f"{path} does not match size given by its header: {len(body)}"
            f" vs {d_size * data_width} bytes")
    if data_width == 8:
        vals = np.frombuffer(body, dtype="<u8", count=d_size)
        data = np.stack([(vals & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                         (vals >> np.uint64(32)).astype(np.uint32)])
    else:
        data = np.frombuffer(body, dtype=_NP_LE[data_width], count=d_size)

    with open(path + ".sdsl", "rb") as f:
        bits_u32, size_bits = sdsl_io.deserialize_bit_vector_il(f.read())

    m = mibf_mod.freeze(jnp.asarray(bits_u32), size_bits, nhash, kmer,
                        data_width=data_width, sseeds=sseeds)
    if m.d_size != d_size:
        raise ValueError("bit vector popcount disagrees with header size")
    return dataclasses.replace(m, data=jnp.asarray(data.copy()))
