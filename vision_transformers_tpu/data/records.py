"""Packed record files: the LMDB replacement.

The reference packs ImageFolder trees into LMDB (reference preprocess.py:13-40:
key ``str(i)``, value = 4-byte zero-padded ASCII class id + raw undecoded
image bytes, plus a ``length`` key; read back by dataset.py:126-150).  lmdb is
not available here, and a single append-only record file + offset index is
the better fit for TPU-host streaming anyway: sequential reads, zero-copy
mmap slicing, trivially shardable by offset.

Layout:
- ``<split>.rec``  — concatenated records, each ``b"%04d" % class_id`` (4
  ASCII bytes, same as the reference's LMDB values) followed by the raw
  image bytes
- ``<split>.idx``  — numpy uint64 array of n+1 byte offsets into the .rec
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Optional, Sequence, Tuple

import numpy as np

__all__ = ["RecordWriter", "RecordDataset", "IMG_EXTENSIONS", "pack_image_folder"]

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                  ".tiff", ".webp")


class RecordWriter:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._rec = open(path + ".rec", "wb")
        self._offsets = [0]

    def append(self, class_id: int, payload: bytes) -> None:
        record = (b"%04d" % class_id) + payload
        self._rec.write(record)
        self._offsets.append(self._offsets[-1] + len(record))

    def close(self) -> int:
        self._rec.close()
        np.save(self.path + ".idx.npy", np.asarray(self._offsets, np.uint64))
        # np.save appends .npy; normalize name to <path>.idx
        os.replace(self.path + ".idx.npy", self.path + ".idx")
        return len(self._offsets) - 1


class RecordDataset:
    """mmap-backed reader (lazy-open per process, like the reference's
    lazy LMDB env, dataset.py:33-49).

    ``reader`` mirrors the reference ``LMDBReader`` payload decodings
    (dataset.py:50-125): ``raw`` (bytes, default — images stay undecoded),
    ``str`` (utf-8), ``pickle``, ``npy`` (numpy array; the torch-tensor
    reader of the reference maps to arrays here)."""

    def __init__(self, path: str, reader: str = "raw"):
        self.path = path
        if not os.path.exists(path + ".rec"):
            raise FileNotFoundError(f"{path}.rec not found")
        if reader not in ("raw", "str", "pickle", "npy"):
            raise ValueError(f"unknown reader {reader!r}")
        self.reader = reader
        self._offsets = np.load(path + ".idx", allow_pickle=False)
        self._data: Optional[np.memmap] = None

    def _ensure_open(self):
        if self._data is None:
            self._data = np.memmap(self.path + ".rec", dtype=np.uint8, mode="r")
        return self._data

    def __len__(self) -> int:
        return len(self._offsets) - 1

    def _decode(self, payload: bytes):
        if self.reader == "raw":
            return payload
        if self.reader == "str":
            return payload.decode("utf-8")
        if self.reader == "pickle":
            import pickle

            return pickle.loads(payload)
        import io

        return np.load(io.BytesIO(payload), allow_pickle=False)

    def get(self, index: int) -> Tuple[int, Any]:
        data = self._ensure_open()
        lo, hi = int(self._offsets[index]), int(self._offsets[index + 1])
        raw = bytes(data[lo:hi])
        return int(raw[:4]), self._decode(raw[4:])


def pack_image_folder(root: str, out_path: str, verbose: bool = True) -> int:
    """Pack a class-per-directory tree (reference preprocess.py semantics:
    classes sorted alphabetically → ids 0..n-1, files stored undecoded)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    class_to_id = {c: i for i, c in enumerate(classes)}
    writer = RecordWriter(out_path)
    n = 0
    for cls in classes:
        cdir = os.path.join(root, cls)
        for dirpath, _, files in sorted(os.walk(cdir)):
            for fname in sorted(files):
                if not fname.lower().endswith(IMG_EXTENSIONS):
                    continue
                with open(os.path.join(dirpath, fname), "rb") as f:
                    writer.append(class_to_id[cls], f.read())
                n += 1
                if verbose and n % 10000 == 0:
                    print(f"packed {n} images", flush=True)
    total = writer.close()
    if verbose:
        print(f"wrote {total} records ({len(classes)} classes) to {out_path}.rec")
    return total
