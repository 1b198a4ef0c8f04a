"""Data layer: dataset loaders, batch pipeline, handler.

Replaces the reference's data_loader package + pycolmap + the CUDA
BatchFetcher binding (data_loader/, src/utils/batch_fetcher.cpp) with pure
numpy loaders and a threaded prefetcher feeding JAX device buffers.
"""

from radfoam_tpu.data.fetcher import BatchFetcher, hash_randint
from radfoam_tpu.data.handler import DataHandler, get_up

__all__ = ["BatchFetcher", "DataHandler", "get_up", "hash_randint"]
