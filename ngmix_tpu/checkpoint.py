"""Batch-level checkpointing of result tables.

The reference persists nothing per fit (each fit is milliseconds;
SURVEY 5). At TPU scale a run processes millions of stamps in batched
steps, so interrupted runs need resumable output: ``ResultWriter``
appends one compressed npz shard per completed batch with a manifest,
and ``load_results`` concatenates shards back into one table.
"""
import json
import os

import numpy as np


class ResultWriter(object):
    """append batched result dicts as npz shards with resume support.

    Usage::

        writer = ResultWriter("outdir")
        start = writer.next_index()          # resume point (batch index)
        for i in range(start, nbatch):
            results = pipeline(batch_i)
            writer.write(i, results)
    """

    def __init__(self, outdir):
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.manifest_path = os.path.join(outdir, "manifest.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {"shards": {}}

    def next_index(self):
        """first batch index without a completed shard"""
        done = sorted(int(k) for k in self.manifest["shards"])
        i = 0
        for d in done:
            if d != i:
                break
            i += 1
        return i

    def has(self, index):
        return str(index) in self.manifest["shards"]

    def write(self, index, results):
        """write one batch of results (a flat dict of arrays; nested
        dicts are flattened with '/' separators)"""
        flat = {}

        def add(prefix, val):
            if isinstance(val, dict):
                for k, v in val.items():
                    add(f"{prefix}/{k}" if prefix else k, v)
            else:
                flat[prefix] = np.asarray(val)

        add("", results)

        fname = os.path.join(self.outdir, "shard_%06d.npz" % index)
        # np.savez appends .npz when missing, so keep the suffix on the
        # temporary name
        tmp = fname.replace(".npz", ".tmp.npz")
        np.savez_compressed(tmp, **flat)
        os.replace(tmp, fname)

        self.manifest["shards"][str(index)] = os.path.basename(fname)
        tmpm = self.manifest_path + ".tmp"
        with open(tmpm, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmpm, self.manifest_path)


def load_results(outdir):
    """concatenate all shards into one dict of arrays (leading axis =
    stamps, shards in batch order)"""
    manifest_path = os.path.join(outdir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    keys = sorted(manifest["shards"], key=int)
    tables = []
    for k in keys:
        with np.load(os.path.join(outdir, manifest["shards"][k])) as d:
            tables.append({name: d[name] for name in d.files})
    if not tables:
        return {}
    out = {}
    for name in tables[0]:
        parts = [t[name] for t in tables]
        if parts[0].ndim == 0:
            out[name] = np.stack(parts)
        else:
            out[name] = np.concatenate(parts, axis=0)
    return out
