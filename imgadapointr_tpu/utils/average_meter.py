"""Multi-item running averages (reference utils/AverageMeter.py:2-42)."""

from __future__ import annotations


class AverageMeter:
    def __init__(self, items=None):
        self.items = items
        self.n_items = 1 if items is None else len(items)
        self.reset()

    def reset(self):
        self._val = [0.0] * self.n_items
        self._sum = [0.0] * self.n_items
        self._count = [0] * self.n_items

    def update(self, values):
        if isinstance(values, (list, tuple)):
            for i, v in enumerate(values):
                self._val[i] = float(v)
                self._sum[i] += float(v)
                self._count[i] += 1
        else:
            self._val[0] = float(values)
            self._sum[0] += float(values)
            self._count[0] += 1

    def count(self, idx=None):
        if idx is None:
            return self._count[0] if self.n_items == 1 else self._count
        return self._count[idx]

    def val(self, idx=None):
        if idx is None:
            return self._val[0] if self.n_items == 1 else self._val
        return self._val[idx]

    def avg(self, idx=None):
        if idx is None:
            if self.n_items == 1:
                return self._sum[0] / max(self._count[0], 1)
            return [self._sum[i] / max(self._count[i], 1) for i in range(self.n_items)]
        return self._sum[idx] / max(self._count[idx], 1)
