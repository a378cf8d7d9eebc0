from . import nthash, nthash_tables, seeds, u64  # noqa: F401
