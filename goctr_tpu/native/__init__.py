"""Native (C) data-plane tier: compiled hashing + row-assembly kernels for
the host feature pipeline, loaded via ctypes with a transparent Python
fallback when no C compiler is available.

The reference is a compiled Go binary throughout; this tier keeps the
Python-hosted framework's *host* hot loops (string hashing, sample-matrix
assembly) at compiled-language speed while the TPU handles all math.
"""
from goctr_tpu.native.build import get_lib, native_available
from goctr_tpu.native.hashing import (
    fnv1_32_batch, fnv1a_32_batch, hash_bucket_batch, multihot_batch,
    gather_rows_concat,
)
