#!/usr/bin/env python
"""Convert feature caches between store backends (pickle <-> npz <-> orbax).

    python scripts/convert_feature_cache.py src.plk dst.npz

Reads caches written by either this framework or the torch reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transductive_clip_tpu.features.store import _STORES, open_store


def kind_of(path):
    for kind, cls in _STORES.items():
        if path.endswith(cls.suffix):
            return kind
    raise SystemExit(f"Unknown cache suffix for {path}; use one of "
                     f"{sorted(set(c.suffix for c in _STORES.values()))}")


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    features, labels = open_store(kind_of(src)).load(src)
    open_store(kind_of(dst)).save(dst, features, labels)
    print(f"{src} -> {dst}: {features.shape} features, {labels.shape} labels")


if __name__ == "__main__":
    main()
