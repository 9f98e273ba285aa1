"""Abstract dataset protocol + wrapper (reference datasets/few_shot_dataset.py,
vendored there from EasyFSL).

``FewShotDataset`` is the minimal duck type the episodic machinery needs:
indexable items plus ``get_labels``. ``WrapFewShotDataset`` adapts any
(x, y)-indexable dataset. The packed stores consume these via
``pack_dataset``.
"""

from __future__ import annotations

import abc
from typing import List, Sequence, Tuple

import numpy as np


class FewShotDataset(abc.ABC):
    @abc.abstractmethod
    def __getitem__(self, item: int) -> Tuple[np.ndarray, int]:
        raise NotImplementedError(
            "Implementations of FewShotDataset need to define __getitem__"
        )

    @abc.abstractmethod
    def __len__(self) -> int:
        raise NotImplementedError("Implementations of FewShotDataset need to define __len__")

    @abc.abstractmethod
    def get_labels(self) -> List[int]:
        raise NotImplementedError(
            "Implementations of FewShotDataset need to define get_labels"
        )


class WrapFewShotDataset(FewShotDataset):
    """Adapt any indexable (x, label) dataset to the FewShotDataset protocol."""

    def __init__(self, dataset: Sequence):
        self.source = dataset
        self._labels = [int(dataset[i][1]) for i in range(len(dataset))]

    def __getitem__(self, item: int):
        x, y = self.source[item]
        return np.asarray(x), int(y)

    def __len__(self) -> int:
        return len(self.source)

    def get_labels(self) -> List[int]:
        return list(self._labels)


def pack_dataset(dataset: FewShotDataset, mean: float = 0.0, std: float = 1.0, device=None):
    """Pack any FewShotDataset into a device-resident PackedStore."""
    from audio_few_shot_learning_tpu.data.store import PackedStore

    items = [np.asarray(dataset[i][0]) for i in range(len(dataset))]
    labels = dataset.get_labels()
    return PackedStore.pack(items, labels, mean=mean, std=std, device=device)
