from . import bf_format, fasta  # noqa: F401
