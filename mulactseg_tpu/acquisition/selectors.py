"""Region selectors (the reference's active_selection/ plugin family).

Each selector scores every unlabeled superpixel, builds the
(score, 'img,lbl,spx', spx_id) list (my_bvsb.py:29-48 format), sorts
descending and expands the active set (base.py:24-38). All math runs on
device; only the final score-list assembly touches Python.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from mulactseg_tpu.acquisition import scoring
from mulactseg_tpu.data.loader import DataProvider


def _concat_rows(rows):
    """Bulk-fetch the deferred per-batch device rows (single blocking point
    after the whole sweep has been dispatched) and re-pack as one device
    array. Host-side concatenate avoids compiling a fresh N-way concat for
    every pool size."""
    import jax

    return jnp.asarray(np.concatenate(jax.device_get(rows), axis=0))


class RegionSelector:
    """Base: select_next_batch -> calculate_scores -> expand_training_set
    (active_selection/base.py:13-38)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.num_superpixels = cfg.nseg
        self.num_class = cfg.num_classes
        self.active_method = type(self).__module__.split(".")[-1]

    # -- shared helpers --------------------------------------------------------
    def _pool_loader(self, pool_set):
        return DataProvider(pool_set, batch_size=self.cfg.val_batch_size,
                            shuffle=False, drop_last=False, infinite=False,
                            num_workers=self.cfg.val_num_workers)

    def gen_score_list_from_tensor(self, pool_set, scores_tensor: np.ndarray,
                                   keys: List) -> List[Tuple[float, str, int]]:
        """(my_bvsb.py:29-48) — only superpixels still in the pool get rows."""
        scores = []
        sp_dict = pool_set.suppix
        for kdx, key in enumerate(keys):
            path = ",".join(key)
            spxids = sp_dict.get(key[2], [])
            row = scores_tensor[kdx]
            scores.extend([(float(row[i]), path, int(i)) for i in spxids])
        return scores

    def calculate_scores(self, trainer, pool_set):
        raise NotImplementedError

    def select_next_batch(self, trainer, active_set, selection_count):
        scores = self.calculate_scores(trainer, active_set.trg_pool_dataset)
        if self.cfg.save_scores:
            d = os.path.join(self.cfg.model_save_dir, "AL_record")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(
                    d, f"region_val_{active_set.selection_iter}.json"), "w") as f:
                json.dump(scores, f)
        selected = sorted(scores, reverse=True)
        return active_set.expand_training_set(selected, selection_count,
                                              self.active_method)


class RandomSelector(RegionSelector):
    """my_random.py: uniform random score per pool superpixel."""

    def __init__(self, cfg, seed=0):
        super().__init__(cfg)
        self.active_method = "my_random"
        self.rng = np.random.RandomState(seed)

    def calculate_scores(self, trainer, pool_set):
        scores = []
        for key in pool_set.im_idx:
            path = ",".join(key)
            for i in pool_set.suppix.get(key[2], []):
                scores.append((float(self.rng.rand()), path, int(i)))
        return scores


class DummySelector(RegionSelector):
    """dummy.py: no-op (resume path)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.active_method = "dummy"

    def select_next_batch(self, trainer, active_set, selection_count):
        return 0, 0


class BvsbSelector(RegionSelector):
    """my_bvsb.py / my_bvsb_banignore.py: region-mean BvSB, min-max
    normalized; optional ignore-dominant ban."""

    def __init__(self, cfg, ban_ignore=False):
        super().__init__(cfg)
        self.ban_ignore = ban_ignore
        self.active_method = "my_bvsb_banignore" if ban_ignore else "my_bvsb"

    def calculate_scores(self, trainer, pool_set):
        cfg = self.cfg
        drop_last = "predignore" in cfg.method
        rows, votes_rows, keys = [], [], []
        # per-batch results stay ON DEVICE until the loop ends: a per-batch
        # np.asarray blocks on the ~75 ms tunnel round trip each iteration,
        # serializing dispatch latency into the sweep; deferring the fetch
        # lets dispatches pipeline (the (B, nseg) rows are tiny)
        for batch in self._pool_loader(pool_set):
            logits = trainer.predict_logits(batch["images"])
            spx = jnp.asarray(batch["spx"])
            r = scoring.region_bvsb_scores(
                logits, spx, nseg=self.num_superpixels, temp=cfg.ce_temp,
                drop_last=drop_last)
            rows.append(r)
            keys.extend(batch["fnames"])
            if self.ban_ignore:
                _, votes = scoring.region_weighted_bvsb_and_votes(
                    logits, spx,
                    jnp.ones((logits.shape[-1],), jnp.float32),
                    nseg=self.num_superpixels, temp=cfg.ce_temp)
                votes_rows.append(votes)
        scores = scoring.minmax_normalize(_concat_rows(rows))
        if self.ban_ignore:
            scores = scoring.ban_ignore_dominant(
                scores, _concat_rows(votes_rows))
        return self.gen_score_list_from_tensor(pool_set, np.asarray(scores),
                                               keys)


class BvsbPredClsbalPwrSelector(RegionSelector):
    """The paper's selector (my_bvsb_predclsbal_pwr_banignore.py):
    pass 1 estimates the predicted label distribution; class weights
    (k*p+1)^-2; pass 2 scores regions with pixel-wise weighted BvSB and
    bans ignore-dominant regions."""

    def __init__(self, cfg, ban_ignore=True):
        super().__init__(cfg)
        self.ban_ignore = ban_ignore
        self.active_method = ("my_bvsb_predclsbal_pwr_banignore"
                              if ban_ignore else "my_bvsb_predclsbal_pwr")

    def calculate_scores(self, trainer, pool_set):
        cfg = self.cfg
        # pass 1: dataset-mean softmax
        cum = None
        nb = 0
        for batch in self._pool_loader(pool_set):
            logits = trainer.predict_logits(batch["images"])
            m = scoring.mean_softmax(logits, cfg.ce_temp)
            cum = m if cum is None else cum + m
            nb += 1
        cls_weight = scoring.cls_weight_pwr(cum / nb, cfg.cls_weight_coeff)

        # pass 2: weighted region scores + votes (fetch deferred — see
        # BvsbSelector.calculate_scores)
        rows, votes_rows, keys = [], [], []
        for batch in self._pool_loader(pool_set):
            logits = trainer.predict_logits(batch["images"])
            spx = jnp.asarray(batch["spx"])
            r, v = scoring.region_weighted_bvsb_and_votes(
                logits, spx, cls_weight, nseg=self.num_superpixels,
                temp=cfg.ce_temp)
            rows.append(r)
            votes_rows.append(v)
            keys.extend(batch["fnames"])
        scores = _concat_rows(rows)
        if self.ban_ignore:
            scores = scoring.ban_ignore_dominant(
                scores, _concat_rows(votes_rows))
        return self.gen_score_list_from_tensor(pool_set, np.asarray(scores),
                                               keys)


class BvsbClsbalV2Selector(RegionSelector):
    """my_bvsb_clsbal_v2.py: BvSB region means, min-max normalized, then
    weighted by exp(-estimated dominant-label distribution) where the
    distribution comes from per-region top-1-vote dominant classes (Cai
    CVPR'21 style; my_bvsb_clsbal_v2.py:22-73)."""

    def __init__(self, cfg, ban_ignore=False):
        super().__init__(cfg)
        self.ban_ignore = ban_ignore
        self.active_method = ("my_bvsb_clsbal_v2_banignore" if ban_ignore
                              else "my_bvsb_clsbal_v2")

    def calculate_scores(self, trainer, pool_set):
        cfg = self.cfg
        rows, votes_rows, keys = [], [], []
        for batch in self._pool_loader(pool_set):
            logits = trainer.predict_logits(batch["images"])
            spx = jnp.asarray(batch["spx"])
            r, v = scoring.region_weighted_bvsb_and_votes(
                logits, spx, jnp.ones((logits.shape[-1],), jnp.float32),
                nseg=self.num_superpixels, temp=cfg.ce_temp)
            rows.append(r)
            votes_rows.append(v)
            keys.extend(batch["fnames"])
        scores = np.asarray(scoring.minmax_normalize(_concat_rows(rows)))
        votes = np.asarray(_concat_rows(votes_rows))
        flat_votes = votes.reshape(-1, votes.shape[-1])
        dominant = flat_votes.argmax(axis=1)
        dist = np.bincount(dominant, minlength=votes.shape[-1]).astype(
            np.float64)
        dist = dist / max(dist.sum(), 1)
        cls_weight = np.exp(-dist)
        weighted = (cls_weight[dominant] *
                    scores.reshape(-1)).reshape(scores.shape)
        if self.ban_ignore:
            weighted = np.asarray(scoring.ban_ignore_dominant(
                jnp.asarray(weighted), jnp.asarray(votes)))
        return self.gen_score_list_from_tensor(pool_set, weighted, keys)


SELECTORS = {
    "my_random": lambda cfg: RandomSelector(cfg, seed=cfg.seed),
    "dummy": DummySelector,
    "my_bvsb": lambda cfg: BvsbSelector(cfg, ban_ignore=False),
    "my_bvsb_banignore": lambda cfg: BvsbSelector(cfg, ban_ignore=True),
    "my_bvsb_predclsbal_pwr": lambda cfg: BvsbPredClsbalPwrSelector(
        cfg, ban_ignore=False),
    "my_bvsb_predclsbal_pwr_banignore": lambda cfg:
        BvsbPredClsbalPwrSelector(cfg, ban_ignore=True),
    "my_bvsb_clsbal_v2": lambda cfg: BvsbClsbalV2Selector(
        cfg, ban_ignore=False),
    "my_bvsb_clsbal_v2_banignore": lambda cfg: BvsbClsbalV2Selector(
        cfg, ban_ignore=True),
}


def get_selector(name: str, cfg) -> RegionSelector:
    if name not in SELECTORS:
        raise KeyError(f"unknown selector {name!r}; have {sorted(SELECTORS)}")
    return SELECTORS[name](cfg)
