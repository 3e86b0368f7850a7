"""Serving layer: dynamic micro-batching HTTP scoring service.

The production front end the reference never had — its eval loop scores one
utterance per host<->device round trip (reference/ASV_dl_func.py:1467-1515).
Here concurrent requests aggregate into fixed-shape device batches so one
chip serves many clients at its batched throughput. See
``serve/server.py`` for the design rationale.
"""

from audioanalysisdetector_tpu.serve.multiproc import (
    MultiprocessServer,
)
from audioanalysisdetector_tpu.serve.server import (
    BatchingScorer,
    ScoreServer,
    ServiceOverloaded,
    build_mel_scorer,
)

__all__ = [
    "BatchingScorer",
    "MultiprocessServer",
    "ScoreServer",
    "ServiceOverloaded",
    "build_mel_scorer",
]
