"""btl_bloomfilter_tpu: a TPU-native k-mer membership engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
bcgsc/btl_bloomfilter (the BTL C++ Bloom filter library for bioinformatics):

  * ``ops.nthash``    — ntHash as a data-parallel prefix-scan (all windows
                        of a sequence hashed at once, bit-exact)
  * ``ops.seeds``     — spaced-seed hashing (stHash / ssHash equivalents)
  * ``models.bloom``  — bit-array Bloom filter (scatter-OR / gather-AND)
  * ``models.counting`` — counting Bloom filter with conservative update
  * ``models.kmer_bloom`` — sequence-level insert/query wrappers
  * ``models.mibf``   — multi-index Bloom filter (rank/select ID lookup)
  * ``io.bf_format``  — byte-exact .bf serialization
  * ``io.fasta``      — batched FASTA streaming
  * ``parallel``      — device-mesh sharding/replication, OR-allreduce
                        merges, all-to-all query routing

Filter states are pytrees; all update/query functions are pure and
jit/shard_map-compatible.
"""

__version__ = "0.1.0"

from . import io, kernels, models, ops, parallel, utils  # noqa: F401
