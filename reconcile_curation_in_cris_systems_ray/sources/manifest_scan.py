"""Partition-manifest writes + stats-pruned reads (lakehouse file
skipping).

The resumable-output discipline (SURVEY §2.1 S4: one file per
partition) extended with the other half of the lakehouse contract: a
MANIFEST recording per-file min/max key stats, so a range-filtered
read opens ONLY the overlapping files — at 100 TB the difference
between touching 5 files and 5,000.  The write is one bucketed
shuffle (each partition's rows co-locate once and write one parquet
file from inside the task — the driver never sees rows, only the
O(partitions) manifest); the pruned read is a plain
``ray.data.read_parquet`` over the surviving file list, so every
downstream stage streams as usual.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def write_partitioned_with_stats(ds, path: str, part_fn, key_col: str,
                                 num_buckets: int = 64) -> dict:
    """Write ``ds`` as one parquet file per ``part_fn(df)`` value with a
    min/max-stats manifest over ``key_col``.

    ``part_fn``: vectorized pandas fn mapping a DataFrame to an int64
    partition id per row.  Returns the manifest dict (also written to
    ``path/manifest.json``).
    """
    from ..stages.shuffle import bucketed_map_groups

    os.makedirs(path, exist_ok=True)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__part"] = part_fn(df).astype(np.int64)
        return out

    tagged = ds.map_batches(add_part, batch_format="pandas")

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for part, g in df.groupby("__part", sort=False):
            fname = os.path.join(path, f"part-{int(part):06d}.parquet")
            g.drop(columns=["__part"]).to_parquet(fname, index=False)
            k = g[key_col].to_numpy()
            rows.append((fname, int(part), len(g),
                         int(k.min()), int(k.max())))
        return pd.DataFrame(rows, columns=["file", "part", "rows",
                                           "key_min", "key_max"])

    entries = bucketed_map_groups(tagged, ["__part"], write_group,
                                  num_buckets=num_buckets).to_pandas()
    manifest = {"key_col": key_col,
                "files": entries.sort_values("part")
                .to_dict(orient="records")}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_pruned(path: str, lo: int, hi: int):
    """Range-filtered read that PRUNES files via the manifest before
    touching storage.  Returns (dataset, files_read, files_total);
    the dataset still needs the exact row filter (file stats bound
    ranges, they don't guarantee row membership)."""
    import ray.data as rd

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    files = manifest["files"]
    keep = [e["file"] for e in files
            if e["key_max"] >= lo and e["key_min"] <= hi]
    if not keep:
        raise ValueError("no files overlap the requested range")
    return rd.read_parquet(keep), len(keep), len(files)


def write_partitioned_with_bloom(ds, path: str, part_fn, key_col: str,
                                 num_buckets: int = 64,
                                 bits_per_file: int = 1 << 16,
                                 num_hashes: int = 5) -> dict:
    """Write one parquet file per partition plus a PER-FILE Bloom
    filter over ``key_col`` in the manifest — the equality-probe
    counterpart of :func:`write_partitioned_with_stats` (min/max
    stats prune RANGES; they cannot prune a point lookup on a key the
    partitioning does not sort, which is the common "fetch this
    user/doc id" access at 100 TB).  Each file's bitmap is built from
    the rows ALREADY co-located for that file's write — no extra pass,
    no shuffle; the manifest holds hex-encoded bitmaps
    (``bits_per_file``/8 bytes each, O(files) total driver state).
    """
    import binascii

    from ..stages.bloom import _bit_positions, _key_hashes
    from ..stages.shuffle import bucketed_map_groups

    os.makedirs(path, exist_ok=True)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__part"] = part_fn(df).astype(np.int64)
        return out

    tagged = ds.map_batches(add_part, batch_format="pandas")

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for part, g in df.groupby("__part", sort=False):
            fname = os.path.join(path, f"part-{int(part):06d}.parquet")
            g.drop(columns=["__part"]).to_parquet(fname, index=False)
            bitmap = np.zeros(bits_per_file // 8, dtype=np.uint8)
            h = _key_hashes(g[key_col].to_numpy())
            pos = _bit_positions(h, bits_per_file, num_hashes).ravel()
            np.bitwise_or.at(bitmap, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
            rows.append((fname, int(part), len(g),
                         binascii.hexlify(bitmap.tobytes()).decode()))
        return pd.DataFrame(rows, columns=["file", "part", "rows",
                                           "bloom_hex"])

    entries = bucketed_map_groups(tagged, ["__part"], write_group,
                                  num_buckets=num_buckets).to_pandas()
    manifest = {"key_col": key_col, "num_hashes": num_hashes,
                "num_bits": bits_per_file,
                "files": entries.sort_values("part")
                .to_dict(orient="records")}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_bloom_pruned(path: str, keys):
    """Point-lookup read that opens ONLY files whose Bloom filter may
    contain at least one of ``keys`` (a false negative is impossible,
    so the read is exact after the row filter).  Returns ``(dataset,
    files_read, files_total)``."""
    import binascii

    import ray.data as rd

    from ..stages.bloom import bloom_might_contain

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    probe = np.asarray(list(keys))
    nh = int(manifest["num_hashes"])
    keep = []
    for e in manifest["files"]:
        bitmap = np.frombuffer(
            binascii.unhexlify(e["bloom_hex"]), dtype=np.uint8)
        if bloom_might_contain(bitmap, probe, nh).any():
            keep.append(e["file"])
    if not keep:
        raise ValueError("no file may contain the probed keys")
    return rd.read_parquet(keep), len(keep), len(manifest["files"])
