"""Data pipeline: overlap mixing, triplet datasets, host-sharded loaders.

The reference preprocesses offline (`preprocess_by_csv*.py` → wav/.pt
triplet files) and feeds them through a 14-worker torch DataLoader
(`utils/dataset.py`).  Here the same mixing capabilities are a library
(`mixer`) usable both offline (preprocess CLI) and on-the-fly, and the
loader is a deterministic, checkpointable iterator producing fixed-shape
per-host batches (static shapes ⇒ one XLA compilation).
"""

from voicesplit_tpu.data.mixer import MixedSample, mix_overlap, mix_sequential
from voicesplit_tpu.data.dataset import (
    SampleFiles,
    SeparationDataset,
    BatchIterator,
    discover_samples,
    train_dataloader,
    eval_dataloader,
    test_dataloader,
)
from voicesplit_tpu.data.synthetic import build_synthetic_dataset
