"""Serving layer: continuous batching over a stream of requests.

Absent from the reference (single-process batch runs only, SURVEY.md §2.5)
but required by the north star (BASELINE.json config 5: "continuous-
batched image stream"). TPU-shaped design: requests accumulate in a host
queue, a scheduler drains them into bucketed static batch shapes (the one
re-jit axis), and one device stream executes in order while the host
overlaps preprocessing and fetches.
"""
from .batcher import BatchingService, BucketStats, Request, ServiceStats
from .http import InferenceServer

__all__ = ["BatchingService", "BucketStats", "InferenceServer", "Request",
           "ServiceStats"]
