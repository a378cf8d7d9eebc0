from . import bloom, counting, kmer_bloom  # noqa: F401
