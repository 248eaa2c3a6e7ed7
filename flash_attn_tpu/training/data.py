"""LM data pipeline: mmap token cache + fault-tolerant resumable sampling.

Parity surface for the reference training data stack
(training/src/datamodules/language_modeling_hf.py mmap token cache;
training/src/datamodules/fault_tolerant_sampler.py:9
``RandomFaultTolerantSampler`` — state_dict = RNG state + counter, so a
resumed run continues exactly where it stopped).

The batch-gather hot path uses the native C++ loader
(flash_attn_tpu/csrc/dataloader.cpp, threaded mmap gather) when built,
falling back to numpy. Token files are flat binaries of uint16/uint32 token
ids (the reference's .bin mmap cache format).
"""

import dataclasses
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from flash_attn_tpu.csrc import native_loader

__all__ = ["TokenDataset", "FaultTolerantSampler", "LMDataLoader",
           "ImageDataset", "ImageDataLoader"]


class TokenDataset:
    """Memory-mapped flat token file."""

    def __init__(self, path: str, dtype=np.uint16, seqlen: int = 1024):
        self.path = path
        self.dtype = np.dtype(dtype)
        self.seqlen = seqlen
        size = os.path.getsize(path) // self.dtype.itemsize
        self.tokens = np.memmap(path, dtype=self.dtype, mode="r", shape=(size,))
        # +1 token for the shifted label
        self.num_samples = (size - 1) // seqlen
        self._native = native_loader.open_token_file(
            path, self.dtype.itemsize)

    def __len__(self):
        return self.num_samples

    def batch(self, indices: np.ndarray) -> np.ndarray:
        """Gather (len(indices), seqlen+1) token windows."""
        starts = indices.astype(np.int64) * self.seqlen
        if self._native is not None:
            return native_loader.fill_batch(
                self._native, starts, self.seqlen + 1, self.dtype)
        out = np.empty((len(starts), self.seqlen + 1), self.dtype)
        for i, s in enumerate(starts):
            out[i] = self.tokens[s:s + self.seqlen + 1]
        return out


@dataclasses.dataclass
class FaultTolerantSampler:
    """Random permutation sampler whose full state is (seed, epoch, counter)
    — checkpointable and exactly resumable (reference
    fault_tolerant_sampler.py:9)."""
    num_samples: int
    seed: int = 0
    epoch: int = 0
    counter: int = 0
    shuffle: bool = True

    def state_dict(self):
        return {"seed": self.seed, "epoch": self.epoch,
                "counter": self.counter}

    def load_state_dict(self, state):
        self.seed = int(state["seed"])
        self.epoch = int(state["epoch"])
        self.counter = int(state["counter"])

    def _perm(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.num_samples)
        rng = np.random.default_rng(self.seed + self.epoch * 1_000_003)
        return rng.permutation(self.num_samples)

    def next_indices(self, n: int) -> np.ndarray:
        """Next n sample indices, rolling over epochs."""
        out = []
        perm = self._perm()
        while n > 0:
            take = min(n, self.num_samples - self.counter)
            out.append(perm[self.counter:self.counter + take])
            self.counter += take
            n -= take
            if self.counter >= self.num_samples:
                self.epoch += 1
                self.counter = 0
                perm = self._perm()
        return np.concatenate(out)


class LMDataLoader:
    """Batches of (input_ids, labels) with resumable state."""

    def __init__(self, dataset: TokenDataset, batch_size: int,
                 sampler: Optional[FaultTolerantSampler] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or FaultTolerantSampler(len(dataset))

    def state_dict(self):
        return self.sampler.state_dict()

    def load_state_dict(self, state):
        self.sampler.load_state_dict(state)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            idx = self.sampler.next_indices(self.batch_size)
            chunk = self.dataset.batch(idx).astype(np.int32)
            yield chunk[:, :-1], chunk[:, 1:]


class ImageDataset:
    """Memory-mapped image classification dataset — the ImageNet-style
    datamodule (reference training/src/datamodules/imagenet.py) expressed
    as flat binary caches instead of a torchvision folder walk: a
    (N, H, W, C) uint8 image file + an (N,) int32 label file, mmap'd and
    batch-gathered. Normalization uses the standard ImageNet statistics
    (reference imagenet.py:36 ``imagenet_normalization``)."""

    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, images_path: str, labels_path: str,
                 image_shape: Tuple[int, int, int], normalize: bool = True):
        self.image_shape = tuple(image_shape)
        per = int(np.prod(image_shape))
        size = os.path.getsize(images_path)
        assert size % per == 0, (size, image_shape)
        n = size // per
        self.images = np.memmap(images_path, dtype=np.uint8, mode="r",
                                shape=(n,) + self.image_shape)
        self.labels = np.memmap(labels_path, dtype=np.int32, mode="r",
                                shape=(n,))
        self.normalize = normalize
        self.num_samples = n

    def __len__(self):
        return self.num_samples

    def batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        imgs = self.images[indices].astype(np.float32) / 255.0
        if self.normalize:
            imgs = (imgs - self.MEAN) / self.STD
        return imgs, self.labels[indices].astype(np.int32)


class ImageDataLoader:
    """Batches of (images, labels) with the same resumable sampler as the
    LM loader; optional horizontal-flip augmentation derived from
    (seed, epoch, sample index) so augmentation REPLAYS exactly across a
    checkpoint resume (the fault-tolerance contract extends to the
    augmentation RNG, which the reference's torchvision transforms do not
    guarantee)."""

    def __init__(self, dataset: ImageDataset, batch_size: int,
                 sampler: Optional[FaultTolerantSampler] = None,
                 random_flip: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or FaultTolerantSampler(len(dataset))
        self.random_flip = random_flip

    def state_dict(self):
        return self.sampler.state_dict()

    def load_state_dict(self, state):
        self.sampler.load_state_dict(state)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            epoch = self.sampler.epoch
            idx = self.sampler.next_indices(self.batch_size)
            imgs, labels = self.dataset.batch(idx)
            if self.random_flip:
                # counter-hash RNG keyed on (seed, epoch, sample idx):
                # stateless, exactly resumable
                h = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                     + np.uint64(self.sampler.seed * 2654435761
                                 + epoch * 40503))
                flip = ((h >> np.uint64(17)) & np.uint64(1)).astype(bool)
                imgs = np.where(flip[:, None, None, None],
                                imgs[:, :, ::-1], imgs)
            yield imgs, labels
