"""Pseudo-label generation driver (the eval_AL --method eval_save_*
equivalents).

Walks the labeled set at full resolution, runs feat_forward (optionally
10-view TTA or sliding-window feature accumulation), generates the chosen
pseudo-label type, saves PNGs under <save_root>/plbl_gen[_<type>]/
round_<k>/ (path convention of trainer/eval_save_cosplbl_prop.py:35-44)
and streams C+1-class IoU/precision/recall against the precise GT
(:88-117). With save_vis, boundary-overlay visualizations go to a `_vis`
twin directory (eval_save_cosplbl_prop.py:70-86).

Type -> reference generator map:
  cosprop                    eval_save_cosplbl_prop.py
  cosprop_includeonehot      eval_save_cosplbl_prop_includeonehot.py
  cosprop_includeonehot_slide  ..._includeonehot_slide.py (sliding feats)
  cosprop_filtered           eval_save_cosplbl_prop_filtered.py
  cosprop_plusonehot         eval_save_cosplbl_prop_plusonehot.py
  cosprop_onehot(_ignore)    eval_save_cosplbl_prop_onehot(ignore).py
  cos_withinspx              eval_save_cosplbl_prop_withinspx.py
  cos_withinspx_includeonehot / cosplbl   eval_save_cosplbl.py, eval_save_plbl.py
  cosplbl_filtgt             eval_save_cosplbl_filtgt.py
  cos_naiveprop              eval_save_cosplbl_naiveprop.py
  within_multihot / candidate  eval_save_candidateplbl.py
  candidate_prop             eval_save_candidateplbl_prop.py
  naive_argmax               eval_save_cosplbl_naive_voc.py
  naive                      eval_save_naiveplbl.py
"""

from __future__ import annotations

import os
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mulactseg_tpu.engine.tta import tta_feat_forward
from mulactseg_tpu.plbl.cosine_prop import (
    cosine_prototype_plbl,
    selected_spx_adjacency,
)
from mulactseg_tpu.plbl.simple import (
    naive_argmax_plbl,
    naive_threshold_fill,
    naive_threshold_plbl,
    within_multihot_plbl,
)
from mulactseg_tpu.utils.metrics import MeanIoU

def _unpack_bits(packed, n):
    # inverse of np.packbits(..., bitorder="little"): (..., ceil(n/8))
    # uint8 -> (..., n) bool, done on device so the tunnel carries
    # 1 bit/element instead of 1 byte
    bits = (packed[..., None] >>
            jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], -1)[..., :n].astype(bool)


def _pack_spx12(ids: np.ndarray) -> np.ndarray:
    """2 superpixel ids per 3 bytes (ids < 4096, i.e. nseg <= 4096): the
    id stream is the second-largest wire item (4.2 MB as u16 at
    1024x2048) and the tunnel moves ~42 MB/s, so the 12-bit pack buys
    ~25 ms/image. Odd-length streams are padded with one zero id; the
    decoder slices back to the true element count. Inverse of the
    "spx12" branch in _decode_buf (round-trip pinned by
    tests/test_eval_paths.py::test_spx12_roundtrip)."""
    assert ids.max(initial=0) < 4096, "spx12 pack needs ids < 4096"
    v = ids.astype(np.uint32).reshape(-1)
    if v.size % 2:
        v = np.append(v, np.uint32(0))
    pair = v.reshape(-1, 2)
    b = np.empty((pair.shape[0], 3), np.uint8)
    b[:, 0] = pair[:, 0] & 0xFF
    b[:, 1] = ((pair[:, 0] >> 8) & 0xF) | ((pair[:, 1] & 0xF) << 4)
    b[:, 2] = pair[:, 1] >> 4
    return b.reshape(-1)


def _decode_buf(buf, layout):
    """Device-side unpacking of the one-buffer argument pack produced by
    PseudoLabelGenerator._fused_args: a few fused slice/bitcast ops per
    entry. `layout` is the static tuple of (name, offset, nbytes,
    dtype-string, shape) descriptors."""
    out = {}
    for name, off, nbytes, dtype, shape in layout:
        seg = buf[off:off + nbytes]
        n_elem = int(np.prod(shape))
        if dtype == "spx12":
            b = seg.reshape(-1, 3).astype(jnp.int32)
            v0 = b[:, 0] | ((b[:, 1] & 0xF) << 8)
            v1 = (b[:, 1] >> 4) | (b[:, 2] << 4)
            vals = jnp.stack([v0, v1], axis=-1).reshape(-1)
            out[name] = vals[:n_elem].reshape(shape)  # drop odd-pad id
            continue
        dt = jnp.dtype(jnp.bfloat16 if dtype == "bfloat16" else dtype)
        if dt.itemsize == 1:
            x = seg.astype(dt) if dtype == "bool" else seg
        else:
            # raw little-endian bytes -> dt (matches the host's
            # ndarray.view(uint8) byte order; TPU/XLA bitcast of
            # (n, k) uint8 -> (n,) k-byte values is little-endian,
            # pinned by test_plbl_generator_u8_wire_matches_float)
            x = jax.lax.bitcast_convert_type(
                seg.reshape(-1, dt.itemsize), dt)
        out[name] = x.reshape(shape)
    return out


# types whose core is the cosine-prototype machinery
_COS_TYPES = {
    # name: (include_onehot, propagate, filter_within, filter_prop)
    "cosprop": (False, True, False, False),
    "cosprop_includeonehot": (True, True, False, False),
    "cosprop_includeonehot_slide": (True, True, False, False),
    "cosprop_filtered": (False, True, False, True),
    "cosprop_plusonehot": (False, True, False, False),
    "cos_withinspx": (False, False, False, False),
    "cos_withinspx_includeonehot": (True, False, False, False),
    "cosplbl": (True, False, False, False),
    "cosplbl_filtgt": (True, False, True, False),
    "cos_naiveprop": (True, False, False, False),
    "cosprop_onehot": (True, True, False, False),
    "cosprop_onehotignore": (True, True, False, False),
}

PLBL_TYPES = tuple(sorted(_COS_TYPES)) + (
    "naive_argmax", "naive", "within_multihot", "candidate",
    "candidate_prop")

# reference trainer-module names -> plbl types, so the original
# `eval_AL.py --method eval_save_*` command lines keep working
# (cli/eval_al.py resolves cfg.method through this; `_ms` suffixes turn
# on the 10-view TTA, `_voc` is implied by --dataset voc)
METHOD_TO_PLBL = {
    "eval_save_cosplbl_prop": "cosprop",
    "eval_save_cosplbl_prop_includeonehot": "cosprop_includeonehot",
    "eval_save_cosplbl_prop_includeonehot_slide": "cosprop_includeonehot_slide",
    "eval_save_cosplbl_prop_includeonehot_voc": "cosprop_includeonehot",
    "eval_save_cosplbl_prop_includeonehot_voc_ms": "cosprop_includeonehot",
    "eval_save_cosplbl_naive_voc": "naive_argmax",
    "eval_save_cosplbl_naive_voc_ms": "naive_argmax",
    "eval_save_naiveplbl": "naive",
    "eval_save_plbl": "cosplbl",
    "eval_save_cosplbl": "cosplbl",
    "eval_save_cosplbl_filtgt": "cosplbl_filtgt",
    "eval_save_cosplbl_naiveprop": "cos_naiveprop",
    "eval_save_cosplbl_prop_filtered": "cosprop_filtered",
    "eval_save_cosplbl_prop_onehot": "cosprop_onehot",
    "eval_save_cosplbl_prop_onehotignore": "cosprop_onehotignore",
    "eval_save_cosplbl_prop_plusonehot": "cosprop_plusonehot",
    "eval_save_cosplbl_prop_withinspx": "cos_withinspx",
    "eval_save_candidateplbl": "candidate",
    "eval_save_candidateplbl_prop": "candidate_prop",
}


class PseudoLabelGenerator:
    def __init__(self, model, cfg, plbl_type: str = "cosprop_includeonehot",
                 use_tta: bool = False, max_protos: int = 1024,
                 fused_batch: Optional[int] = None):
        if plbl_type not in PLBL_TYPES:
            raise KeyError(f"unknown plbl type {plbl_type!r}; have {PLBL_TYPES}")
        self.model = model
        self.cfg = cfg
        self.plbl_type = plbl_type
        self.use_tta = use_tta
        self.max_protos = max_protos
        # images per fused dispatch. DEFAULT 1: grouping 2 full-res
        # (1024x2048) images into one dispatch measured 1.118 img/s vs
        # 2.506 for B=1 on the same commit (tools_dev/bench_round.py
        # plbl, 2026-08-21) — the group's two bf16 full-res feature
        # tensors push the program past the chip's HBM working set and
        # XLA serializes/spills, costing far more than the ~75 ms
        # dispatch latency the group saves. The group path stays
        # available (MULACTSEG_PLBL_BATCH=N) for chips with more HBM;
        # the odd tail of a round runs as one B=1 dispatch (its own
        # cached executable).
        self.fused_batch = int(
            fused_batch if fused_batch is not None
            else os.environ.get("MULACTSEG_PLBL_BATCH", "1"))
        # bf16 feature hand-off when the network computes in bf16 anyway:
        # the full-res upsample writes half the bytes and the cosine
        # kernel's bf16 scan reads them directly. Applied to BOTH the
        # fused and the unfused direct-forward paths so they stay
        # byte-identical (test_eval_paths.py); TTA/sliding keep f32 feats
        # (they average across views before the cosine kernel).
        self._feat_bf16 = (getattr(cfg, "dtype", None) == "bfloat16"
                           and plbl_type in _COS_TYPES)
        self._feat_step = jax.jit(
            lambda p, bs, x: model.apply({"params": p, "batch_stats": bs}, x,
                                         train=False, return_feat=True,
                                         feat_bf16=self._feat_bf16))
        self._fused_step = None
        self._sliding = None
        if plbl_type.endswith("_slide"):
            from mulactseg_tpu.engine.sliding import SlidingEval

            # feature-accumulating sliding twin (utils/sliding_evaluator_
            # plbl.py:16-29): crop 800, stride 2/3, summed logits+feats
            self._sliding = SlidingEval(model, cfg.num_classes + 1,
                                        crop_size=cfg.slide_crop,
                                        stride_rate=cfg.slide_stride_rate,
                                        return_feat=True)
        if (plbl_type in _COS_TYPES and plbl_type != "cosprop_plusonehot"
                and self._sliding is None and not use_tta):
            self._fused_step = self._build_fused()

    def _build_fused(self):
        """One-dispatch per-image executable for the cosine types: forward
        -> softmax -> cosine_prototype_plbl -> uint8 cast (the confusion
        matrix accumulates on the host in _retire from the fetched map, so
        the GT never rides the wire). On this tunnel each dispatch costs
        ~75 ms and chained
        dispatches do not pipeline, so folding the ~6-op eager chain of
        plbl_for_batch + MeanIoU into one jit removes ~0.4 s/image of pure
        latency (the reference pays none of this — its per-image cost is
        the double Python loop, eval_save_cosplbl_prop.py:236-305).

        All per-image arguments arrive as ONE flat uint8 buffer
        (_fused_args packs it): host->device transfers serialize with
        device compute on this tunnel AND pay per-array latency, so one
        device_put of ~13 MB beats eight puts of the same bytes. The
        static `layout` tuple describes the slices; decoding is a few
        fused slice/bitcast ops on device.

        cosprop_plusonehot keeps the unfused path (its one-hot overwrite
        needs the raw spmask, not the multi-hot-restricted pixel_valid)."""
        cfg = self.cfg
        ptype = self.plbl_type
        model = self.model
        include_onehot, propagate, filt_within, filt_prop = _COS_TYPES[ptype]
        nseg = cfg.nseg
        thr_med = cfg.cosprop_threshold_method == "median"
        sim_bf16 = cfg.dtype == "bfloat16"
        ce_temp, plbl_th = cfg.ce_temp, cfg.plbl_th

        def fused(params, batch_stats, buf, *, layout):
            a = _decode_buf(buf, layout)
            images = a["images"]  # (B, H, W, 3)
            if images.dtype == jnp.uint8:
                # loader shipped the raw bytes (EvalRegionDatasetAll
                # emit_u8): normalize here — same f32 ops the host LUT
                # tabulates, so bit-identical to the host path
                from mulactseg_tpu.engine.train import _device_normalize

                images = _device_normalize(images)
            feat, logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False, return_feat=True, feat_bf16=sim_bf16)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            B, H, W = images.shape[:3]
            pixel_valid = _unpack_bits(a["pv_packed"], H * W)  # (B, P)
            proto_adj = _unpack_bits(a["adj_packed"], nseg)  # (B, NP, S)

            def kernel(f, pr, sx, pv, ps, pc, pvd, pa):
                return cosine_prototype_plbl(
                    f, pr, sx, pv, ps, pc, pvd, pa, nseg=nseg,
                    threshold_median=thr_med, propagate=propagate,
                    filter_within_by_pred=filt_within,
                    filter_prop_by_pred=filt_prop, sim_bf16=sim_bf16)

            # vmap over the group: every operand carries a leading B dim
            # (the arg pack stacks per-image tables; they are fixed-size,
            # so no padding is needed beyond what B=1 already paid)
            plbl = jax.vmap(kernel)(
                feat.reshape(B, -1, feat.shape[-1]),
                probs.reshape(B, -1, probs.shape[-1]),
                a["spx_flat"].reshape(B, -1).astype(jnp.int32),
                pixel_valid, a["proto_sid"], a["proto_cls"],
                a["proto_valid"], proto_adj).reshape(B, H, W)
            if ptype == "cos_naiveprop":
                # include_onehot=True for this type, so pixel_valid IS the
                # flat spmask
                plbl = jax.vmap(
                    lambda pl, lg, pv: naive_threshold_fill(
                        pl, lg, pv, temp=ce_temp, plbl_th=plbl_th))(
                    plbl, logits, pixel_valid.reshape(B, H, W))
            # the confusion matrix moved to the HOST (MeanIoU.
            # _after_step_host): the plbl map is fetched anyway (PNG
            # saving), so accumulating there removes the GT upload
            # (2.1 MB/image) from a wire measured at ~42 MB/s up
            return plbl.astype(jnp.uint8)

        return jax.jit(fused, static_argnames=("layout",))

    def _fused_args(self, batches, preps):
        """Host-side packing of one GROUP's fused-step arguments into one
        flat uint8 buffer, sized for the tunnel (~95 MB/s host->device,
        serialized with compute, per-array latency): images as raw uint8
        when the loader shipped bytes (else the network dtype), spx as
        uint16 when nseg allows, the two dense boolean masks bit-packed
        (8x). ~40 MB/image -> ~13 MB, one device_put per group. Every
        entry carries a leading B dim (B = len(batches), the fused_batch
        group size; the round's odd tail produces a B=1 pack with its own
        layout, hence its own cached executable). Runs on generate()'s
        prep worker thread. Returns {"buf": device array, "layout":
        static slice descriptor}."""
        images = np.stack([np.asarray(b["images"])[0] for b in batches])
        if images.dtype != np.uint8:
            # pre-cast to the BACKBONE's compute dtype (its first op is
            # x.astype(dtype), so the host cast is bit-identical and
            # halves the image's tunnel bytes); cfg.dtype is not
            # authoritative — the caller may have built the model in f32.
            # uint8 images (emit_u8 loaders) ship as-is (1 B/px, a
            # further 2x) and normalize on device in the fused step.
            mdt = getattr(getattr(self.model, "backbone", None), "dtype",
                          None)
            if mdt is not None:
                images = images.astype(mdt)
        spx_flat = np.stack([np.asarray(b["spx"][0]).reshape(-1)
                             for b in batches])
        spx12 = spx_flat.max(initial=0) < 4096  # nseg <= 4096 (city 2048)
        if not spx12:
            spx_flat = spx_flat.astype(
                np.uint16
                if spx_flat.max(initial=0) <= np.iinfo(np.uint16).max
                else np.int32)
        # GT labels stay on the HOST: the fused step no longer accumulates
        # the confusion matrix (MeanIoU._after_step_host runs in _retire on
        # the already-fetched map), so the 2.1 MB/image GT upload is gone
        # from a wire measured at ~42 MB/s up.
        args = dict(
            images=images, spx_flat=spx_flat,
            pv_packed=np.stack([np.packbits(p[6], bitorder="little")
                                for p in preps]),
            proto_sid=np.stack([p[2] for p in preps]),
            proto_cls=np.stack([p[3] for p in preps]),
            proto_valid=np.stack([p[4] for p in preps]),
            adj_packed=np.stack([
                np.packbits(p[5], axis=-1, bitorder="little")
                for p in preps]),
        )
        parts, layout, off = [], [], 0
        for name, arr in args.items():
            if name == "spx_flat" and spx12:
                b, dt = _pack_spx12(arr), "spx12"
            else:
                arr = np.ascontiguousarray(arr)
                b, dt = arr.view(np.uint8).reshape(-1), str(arr.dtype)
            layout.append((name, off, b.size, dt, arr.shape))
            parts.append(b)
            off += b.size
        return {"buf": jax.device_put(np.concatenate(parts)),
                "layout": tuple(layout)}

    def _forward(self, params, batch_stats, images):
        if self._sliding is not None:
            return self._sliding(params, batch_stats, images)
        if self.use_tta:
            return tta_feat_forward(self.model, params, batch_stats, images)
        return self._feat_step(params, batch_stats, images)

    def _decode(self, plbl: np.ndarray) -> np.ndarray:
        """Color-decode a pseudo-label map for visualization (255 -> the
        extra class, like torch.masked_fill(plbl, plbl==255, C))."""
        from mulactseg_tpu.data.constants import decode_cityscapes, voc_cmap

        filled = np.where(plbl == 255, self.cfg.num_classes, plbl)
        if self.cfg.dataset == "voc":
            return voc_cmap()[np.clip(filled, 0, 255)].astype(np.uint8)
        return decode_cityscapes(filled)

    def _save_vis(self, plbl: np.ndarray, spx_map: np.ndarray, path: str):
        """Boundary-overlay visualization: the skimage mark_boundaries
        equivalent via ops.morphology.boundary_mask (yellow outlines)."""
        from mulactseg_tpu.ops.morphology import boundary_mask

        color = self._decode(plbl)
        b = np.asarray(boundary_mask(jnp.asarray(spx_map)))
        color[b.astype(bool)] = (255, 255, 0)
        Image.fromarray(color).save(path)

    def _dominant_to_targets(self, dom: np.ndarray, spx_map: np.ndarray):
        """The label-expansion ablation's target construction
        (eval_save_cosplbl_prop_onehot.py:92-104): per-superpixel one-hot
        from a per-pixel dominant-label map (255 = unselected), 255 within
        a selected superpixel -> the extra class. Returns (targets (S,Ct),
        spmask, selected ids)."""
        cfg = self.cfg
        S, C = cfg.nseg, cfg.num_classes
        spmask = dom != 255
        flat_idx = spx_map.reshape(-1)
        flat_dom = dom.reshape(-1)
        seg_cls = np.full(S, -1, np.int64)
        sel = flat_dom != 255
        np.maximum.at(seg_cls, flat_idx[sel], flat_dom[sel].astype(np.int64))
        seg_cls_filled = np.where(seg_cls == 255, C, seg_cls)
        onehot = np.zeros((S, C + 1), np.float32)
        has = seg_cls >= 0
        onehot[np.arange(S)[has],
               np.clip(seg_cls_filled[has], 0, C)] = 1.0
        if self.plbl_type == "cosprop_onehot":
            onehot = onehot[:, :-1]  # drop the converted-ignore channel
        selected = np.nonzero(has)[0].tolist()
        return onehot, spmask, selected

    def generate(self, params, batch_stats, loader: Iterable, *,
                 save_dir: Optional[str] = None, suppix: Optional[dict] = None):
        """loader yields single-image batches with images/labels/target/
        spx/spmask/fnames (the eval_region_*_all contract; the onehot
        ablation types expect `target` to be the per-pixel dominant map).
        `suppix` maps spx path -> selected superpixel ids (the active
        set's labeled dict). Returns (miou, iou_table, precision_table,
        recall_table)."""
        cfg = self.cfg
        ptype = self.plbl_type
        iou = MeanIoU(cfg.num_classes + 1, cfg.ignore_idx)
        vis_dir = f"{save_dir}_vis" if save_dir else None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            if cfg.save_vis:
                os.makedirs(vis_dir, exist_ok=True)

        # three-thread pipelined loop over GROUPS of fused_batch images
        # (1 on the unfused paths). Per group, IN DISPATCH ORDER (the
        # tunnel executes dispatches FIFO, so ordering is the contract):
        #   1. [main] feat forward + plbl kernel + uint8 cast for the
        #      whole group (ONE dispatch on the fused path — the ~75 ms
        #      dispatch latency amortizes over the group)
        #   2. [prep worker] next group's host adjacency + arg pack +
        #      device_put
        #   3. [retire worker] fetch group i's uint8 maps (1 B/px down
        #      the tunnel; blocks until its compute drains, GIL released)
        #      + host CM + PNG save — overlaps the next group's prep.
        # The reference's equivalent loop is fully serial per image
        # (eval_save_cosplbl_prop.py:236-305).
        from concurrent.futures import ThreadPoolExecutor

        def _retire(entry):
            group, u8_dev, spx_maps, acc_host = entry
            maps = np.asarray(u8_dev)
            if maps.ndim == 2:
                maps = maps[None]
            for batch, plbl_np, spx_map in zip(group, maps, spx_maps):
                if acc_host:
                    # fused path: the confusion matrix accumulates on the
                    # HOST from the map that is fetched anyway for PNG
                    # saving — the GT never rides the tunnel. The single
                    # retire worker keeps accumulation ordered; generate()
                    # joins all retire futures before reading the totals.
                    iou._after_step_host(plbl_np, batch["labels"])
                if save_dir:
                    lbl_id = os.path.basename(
                        batch["fnames"][0][1]).split(".")[0]
                    Image.fromarray(plbl_np).save(
                        os.path.join(save_dir, f"{lbl_id}.png"))
                    if cfg.save_vis:
                        self._save_vis(plbl_np, spx_map,
                                       os.path.join(vis_dir,
                                                    f"{lbl_id}.png"))

        pool = ThreadPoolExecutor(max_workers=1)
        # retire (device fetch + PNG encode) runs on its OWN single worker:
        # the fetch blocks on the device pipeline drain (~200 ms/image on
        # this tunnel) but holds no GIL while waiting, so it overlaps with
        # the next group's host_prep instead of serializing after it on
        # the main thread. One worker keeps per-group FIFO order.
        retire_pool = ThreadPoolExecutor(max_workers=1)
        retire_futs = []
        fused = self._fused_step is not None
        gsize = max(1, self.fused_batch) if fused else 1
        timing = os.environ.get("MULACTSEG_PLBL_TIMING") == "1"
        tacc = {"prep": 0.0, "args": 0.0, "dispatch": 0.0, "prep_wait": 0.0,
                "retire": 0.0, "n": 0} if timing else None

        def _next_group(it):
            g = []
            while len(g) < gsize:
                b = next(it, None)
                if b is None:
                    break
                g.append(b)
            return g or None

        def _prep_group(g):
            t0 = time.perf_counter() if timing else 0.0
            ps = [self.host_prep(b, suppix) for b in g]
            if timing:
                tacc["prep"] += time.perf_counter() - t0
                t0 = time.perf_counter()
            if fused and all(p is not None for p in ps):
                a = self._fused_args(g, ps)
                if timing:
                    tacc["args"] += time.perf_counter() - t0
                return ps, a
            return ps, None

        it = iter(loader)
        group = _next_group(it)
        preps, dev_args = _prep_group(group) if group is not None else (
            None, None)
        while group is not None:
            t0 = time.perf_counter() if timing else 0.0
            acc_host = fused and dev_args is not None
            if acc_host:
                spx_maps = [np.asarray(b["spx"][0]) for b in group]
                u8_dev = self._fused_step(
                    params, batch_stats, dev_args["buf"],
                    layout=dev_args["layout"])
            else:
                batch = group[0]
                plbl, spx_map = self.plbl_for_batch(
                    params, batch_stats, batch, suppix, prep=preps[0])
                # confusion_matrix flattens both sides, so the (H, W)
                # device map pairs with the (1, H, W) host labels without
                # an eager (= extra tunnel dispatch) reshape
                u8_dev = iou._after_step_device_u8(plbl, batch["labels"])
                spx_maps = [spx_map]
            if timing:
                tacc["dispatch"] += time.perf_counter() - t0
                tacc["n"] += len(group)
            nxt = _next_group(it)
            prep_future = (pool.submit(_prep_group, nxt)
                           if nxt is not None else None)
            if timing:
                entry = (group, u8_dev, spx_maps, acc_host)
                t0 = time.perf_counter()

                def _timed(e=entry, t=t0):
                    _retire(e)
                    tacc["retire"] += time.perf_counter() - t
                retire_futs.append(retire_pool.submit(_timed))
            else:
                retire_futs.append(retire_pool.submit(
                    _retire, (group, u8_dev, spx_maps, acc_host)))
            group = nxt
            t0 = time.perf_counter() if timing else 0.0
            preps, dev_args = (prep_future.result()
                               if prep_future is not None else (None, None))
            if timing:
                tacc["prep_wait"] += time.perf_counter() - t0
        for f in retire_futs:
            f.result()  # surface worker exceptions + ensure PNGs on disk
        pool.shutdown(wait=False)
        retire_pool.shutdown(wait=False)
        if timing and tacc["n"]:
            n = tacc["n"]
            print("plbl timing ms/img: " + "  ".join(
                f"{k}={v * 1e3 / n:.1f}" for k, v in tacc.items()
                if k != "n"), flush=True)

        ious, precs, recs = iou._after_epoch_ipr()
        miou = float(np.mean(ious))
        fmt = lambda xs: ",".join([f"{np.mean(xs):.2f}"] +
                                  [f"{v:.2f}" for v in xs])
        return miou, fmt(ious), fmt(precs), fmt(recs)

    def host_prep(self, batch, suppix: Optional[dict] = None):
        """Host-side (numpy) work for one cosine-type image: target
        construction, selected-superpixel adjacency, pixel validity.
        Split out of plbl_for_batch so generate() can compute image i+1's
        adjacency on a worker thread while the TPU crunches image i
        (the reference's equivalent is the in-line double Python loop at
        eval_save_cosplbl_prop.py:121-313). Returns None for non-cosine
        types (no host work to overlap)."""
        if self.plbl_type not in _COS_TYPES:
            return None
        cfg = self.cfg
        include_onehot = _COS_TYPES[self.plbl_type][0]
        spx_map = np.asarray(batch["spx"][0])
        spmask = np.asarray(batch["spmask"][0]).astype(bool)
        targets = np.asarray(batch["target"][0], np.float32)
        if self.plbl_type.startswith("cosprop_onehot"):
            dom = np.asarray(batch["target"][0]).astype(np.int64)
            targets, spmask, selected = self._dominant_to_targets(
                dom, spx_map)
        else:
            fname = batch["fnames"][0][2]
            selected = (suppix or {}).get(fname, [])
        proto_sid, proto_cls, proto_valid, proto_adj = \
            selected_spx_adjacency(spx_map, selected, cfg.nseg,
                                   targets, self.max_protos,
                                   include_onehot)
        pixel_valid = spmask.reshape(-1).copy()
        if not include_onehot:
            multi = targets.sum(1) > 1
            pixel_valid &= multi[np.clip(spx_map.reshape(-1), 0,
                                         cfg.nseg - 1)]
        return (targets, spmask, proto_sid, proto_cls, proto_valid,
                proto_adj, pixel_valid)

    def plbl_for_batch(self, params, batch_stats, batch,
                       suppix: Optional[dict] = None, prep=None):
        """One image's pseudo-label map (H, W) for this generator's type;
        also returns the superpixel map (for visualization overlays).
        `prep` is an optional precomputed host_prep result (pipelining)."""
        cfg = self.cfg
        ptype = self.plbl_type
        images = np.asarray(batch["images"])
        if images.dtype == np.uint8:
            # emit_u8 loader feeding an unfused path (TTA, sliding,
            # plusonehot, non-cosine types): normalize on host with the
            # same LUT the loader would have used — bit-identical
            from mulactseg_tpu.data.transforms import normalize

            images = np.stack([normalize(im) for im in images])
        images = jnp.asarray(images)
        spx_map = np.asarray(batch["spx"][0])
        spmask = np.asarray(batch["spmask"][0]).astype(bool)
        targets = np.asarray(batch["target"][0], np.float32)
        H, W = spx_map.shape

        if ptype in ("within_multihot", "candidate", "candidate_prop"):
            logits = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            plbl = within_multihot_plbl(
                logits, jnp.asarray(targets)[None],
                jnp.asarray(spx_map)[None], jnp.asarray(spmask)[None])[0]
            if ptype == "candidate_prop":
                plbl = naive_threshold_fill(
                    plbl, logits[0], jnp.asarray(spmask),
                    temp=cfg.ce_temp, plbl_th=cfg.plbl_th)
        elif ptype == "naive_argmax":
            logits = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            plbl = naive_argmax_plbl(logits, jnp.asarray(spmask)[None],
                                     num_real_classes=logits.shape[-1])[0]
        elif ptype == "naive":
            logits = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            plbl = naive_threshold_plbl(
                logits, jnp.asarray(spmask)[None],
                plbl_th=cfg.plbl_th)[0]
        else:
            include_onehot, propagate, filt_within, filt_prop = \
                _COS_TYPES[ptype]
            feat, logits = self._forward(params, batch_stats, images)
            probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
            if prep is None:
                prep = self.host_prep(batch, suppix)
            targets, spmask, proto_sid, proto_cls, proto_valid, proto_adj, \
                pixel_valid = prep
            plbl = cosine_prototype_plbl(
                feat[0].reshape(-1, feat.shape[-1]),
                probs.reshape(-1, probs.shape[-1]),
                jnp.asarray(spx_map.reshape(-1)),
                jnp.asarray(pixel_valid),
                jnp.asarray(proto_sid), jnp.asarray(proto_cls),
                jnp.asarray(proto_valid), jnp.asarray(proto_adj),
                nseg=cfg.nseg,
                threshold_median=cfg.cosprop_threshold_method == "median",
                propagate=propagate,
                filter_within_by_pred=filt_within,
                filter_prop_by_pred=filt_prop,
                # single-pass bf16 similarity matmuls when the network
                # itself ran in bf16 (see cosine_prop.py) — the f32 dot
                # is 3 MXU passes for <4e-3 of extra precision the
                # features don't carry
                sim_bf16=(cfg.dtype == "bfloat16"),
            ).reshape(H, W)
            if ptype == "cos_naiveprop":
                plbl = naive_threshold_fill(
                    plbl, logits[0], jnp.asarray(spmask),
                    temp=cfg.ce_temp, plbl_th=cfg.plbl_th)
            elif ptype == "cosprop_plusonehot":
                # one-hot selected superpixels keep their annotated
                # class (eval_save_cosplbl_prop_plusonehot.py:312-328)
                onehot_seg = targets.sum(1) == 1
                spc = np.clip(spx_map, 0, cfg.nseg - 1)
                oh_pix = spmask & onehot_seg[spc]
                oh_cls = targets.argmax(1)[spc]
                plbl = jnp.where(jnp.asarray(oh_pix),
                                 jnp.asarray(oh_cls, jnp.int32), plbl)

        return plbl, spx_map


def plbl_save_dir(checkpoint_path: str, plbl_type: Optional[str],
                  round_id: str) -> str:
    """Reproduces the reference's directory convention
    (eval_save_cosplbl_prop.py:35-44)."""
    d = os.path.dirname(checkpoint_path)
    if plbl_type:
        return os.path.join(d, f"plbl_gen_{plbl_type}", f"round_{round_id}")
    return os.path.join(d, "plbl_gen", f"round_{round_id}")
