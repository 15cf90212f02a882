#!/usr/bin/env python
"""Reverse-lookup a wikiart image filename hash to its manifest row.

Parity with the reference's ``style_hash_lookup.py``.

    python style_hash_lookup.py a6ab05c7e9f6e8810d3567c699f620b07600ae19
"""

from __future__ import annotations

import argparse
import json

from realtime_style_transfer_tpu.tracing import logsetup


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image_hash", type=str,
                   help="sha1 filename stem of a wikiart image")
    args = p.parse_args()
    logsetup.setup()

    from realtime_style_transfer_tpu.data.wikiart import lookup_manifest_by_hash

    row = lookup_manifest_by_hash(args.image_hash)
    if row is None:
        print(f"no manifest row found for {args.image_hash}")
        raise SystemExit(1)
    print(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
