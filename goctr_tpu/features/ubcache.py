"""User-behavior cache with time-travel-safe filtering.

Parity with /root/reference/feature/ubcache/cache.go: sequences are stored in
timestamp-descending order; Get(user, max_ts, count) skips entries newer than
max_ts (preventing label leakage during training) then returns the next
`count` items. max_ts==0 → no time filter; count==0 → no length cap.

TPU-native addition: `as_padded_arrays` exports the whole cache as fixed-shape
[n_users, max_len] int32 arrays + length vector, the layout the device-side
behavior-embedding gather consumes (replacing per-sample Go slice munging at
reference recommend/rcmd.go:509-530).
"""
from __future__ import annotations

import dataclasses
import threading
from typing import Optional

import numpy as np


@dataclasses.dataclass
class TimeSeq:
    ts: np.ndarray     # int64, descending
    items: np.ndarray  # int64

    def filter(self, max_ts: int = 0, max_len: int = 0) -> "TimeSeq":
        if self.ts.size == 0:
            return TimeSeq(self.ts, self.items)
        if max_ts == 0:
            max_ts = int(self.ts[0])
        count = int(max_len) if max_len else self.ts.size
        # first index with ts <= max_ts (ts is descending)
        i = int(np.searchsorted(-self.ts, -max_ts, side="left"))
        count = min(count, self.ts.size - i)
        return TimeSeq(self.ts[i:i + count], self.items[i:i + count])


class UserBehaviorCache:

    def __init__(self):
        self._lock = threading.RLock()
        self._ub: dict[int, TimeSeq] = {}

    def set(self, user_id: int, ts, items) -> None:
        with self._lock:
            self._ub[user_id] = TimeSeq(
                np.asarray(ts, dtype=np.int64),
                np.asarray(items, dtype=np.int64))

    def batch_set(self, ub: dict[int, tuple]) -> None:
        with self._lock:
            for uid, (ts, items) in ub.items():
                self._ub[uid] = TimeSeq(
                    np.asarray(ts, dtype=np.int64),
                    np.asarray(items, dtype=np.int64))

    def delete(self, user_id: int) -> None:
        with self._lock:
            self._ub.pop(user_id, None)

    def clear(self) -> None:
        with self._lock:
            self._ub = {}

    def __len__(self) -> int:
        return len(self._ub)

    def get(self, user_id: int, max_ts: int = 0,
            count: int = 0) -> Optional[TimeSeq]:
        """None when the user is unknown (reference returns an error)."""
        with self._lock:
            seq = self._ub.get(user_id)
            if seq is None:
                return None
            return seq.filter(max_ts, count)

    # ------------------------------------------------------- device export --
    def as_padded_arrays(self, max_len: int,
                         pad_item: int = -1) -> tuple[np.ndarray, ...]:
        """(user_ids[n], items[n, max_len], lengths[n]) with tail padding.

        Items are each user's latest `max_len` behaviors (no time filter —
        callers needing per-sample max_ts use get()); pad_item marks padding
        so embedding lookups can mask it.
        """
        with self._lock:
            n = len(self._ub)
            user_ids = np.fromiter(self._ub.keys(), dtype=np.int64, count=n)
            items = np.full((n, max_len), pad_item, dtype=np.int64)
            lengths = np.zeros(n, dtype=np.int32)
            for r, seq in enumerate(self._ub.values()):
                k = min(max_len, seq.items.size)
                items[r, :k] = seq.items[:k]
                lengths[r] = k
        return user_ids, items, lengths
