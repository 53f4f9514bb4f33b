"""Datalist / region-dict generation (the dataloader/init_data/*/gen_seed.py
and gen_or.py equivalents): write train_seed{nseg}.txt (3 tab-separated
paths per line) and train.dict ({spx_path: [size, missing_ids]}) from a
list of (img, lbl, spx) path triples."""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Sequence, Tuple

import numpy as np

from mulactseg_tpu.data.datasets import open_spx


def gen_datalist(triples: Sequence[Tuple[str, str, str]], out_txt: str):
    os.makedirs(os.path.dirname(os.path.abspath(out_txt)), exist_ok=True)
    with open(out_txt, "w") as f:
        for img, lbl, spx in triples:
            f.write(f"{img}\t{lbl}\t{spx}\n")


def gen_region_dict(triples: Sequence[Tuple[str, str, str]], nseg: int,
                    out_json: str, data_root: str = ""):
    """Scan each superpixel map for absent ids and store the reference's
    [size, missing_ids] format (parsed at region_cityscapes.py:137-153)."""
    out = {}
    for _, _, spx_rel in triples:
        path = os.path.join(data_root, spx_rel) if data_root else spx_rel
        spx = open_spx(path)
        present = np.unique(spx)
        present = present[(present >= 0) & (present < nseg)]
        missing = sorted(set(range(nseg)) - set(present.tolist()))
        out[spx_rel] = [nseg, missing]
    os.makedirs(os.path.dirname(os.path.abspath(out_json)), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(out, f)
    return out
