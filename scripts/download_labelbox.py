#!/usr/bin/env python
"""Download per-polygon mask PNGs from a Labelbox JSON export
(reference utils_scripts/download_labelbox.py — CLI'd, urllib instead of
shelling out to curl, and resumable: existing files are skipped)."""
from __future__ import annotations

import argparse
import json
import urllib.request
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-e", "--export_json", required=True,
                    help="labelbox JSON export file")
    ap.add_argument("-o", "--output_dir", required=True)
    args = ap.parse_args()

    out = Path(args.output_dir)
    out.mkdir(exist_ok=True, parents=True)
    with open(args.export_json) as f:
        data = json.load(f)

    for i, d in enumerate(data):
        objects = d["Label"]["objects"]
        stem = Path(d["External ID"]).stem
        m_out = out / stem[:30]
        m_out.mkdir(exist_ok=True, parents=True)
        for o, obj in enumerate(objects):
            label = obj["value"].replace("_", "")
            m_path = m_out / f"{stem}_{label}_{o}.png"
            if m_path.exists():
                continue
            print(f"{i}/{len(data)} : {o}/{len(objects)} -> {m_path.name}")
            urllib.request.urlretrieve(obj["instanceURI"], str(m_path))


if __name__ == "__main__":
    main()
