"""Cosine-prototype pseudo labels with neighborhood propagation.

TPU re-design of the reference's slowest component — the double Python
loop over superpixels in trainer/eval_save_cosplbl_prop.py:121-313
(median thresholds + per-spx binary dilation + per-spx propagation).
Here the whole image is processed as a handful of dense ops:

  1. per-(superpixel, class) argmax pixels via the segment engine -> one
     prototype feature per annotated class of each selected superpixel
     (eval_save_cosplbl_prop.py:177-201); prototypes live in a static
     (NP,) slot table ordered by flattened (spx, class) — the same order
     the reference's nonzero() produces;
  2. one chunked (pixels x prototypes) cosine-similarity matmul (MXU)
     serves both the within-superpixel nearest-prototype assignment
     (:213-230) and the propagation similarities (:276-305);
  3. per-prototype median/min thresholds via one lexsort (:236-255);
  4. propagation: every pixel picks the highest-id adjacent selected
     superpixel with any prototype above threshold (reproducing the
     reference's last-writer-wins loop order) and takes that
     superpixel's best-similarity prototype class (:276-305);
  5. within-superpixel assignments overwrite propagated ones (:309-310).

Superpixel adjacency (the reference's per-spx binary_dilation loop,
:257-266) is one vectorized numpy pass over 8-neighbor shift pairs,
computed host-side while the TPU crunches the previous image.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mulactseg_tpu.ops.segment import segment_max_grad

NEG = -1e30


def selected_spx_adjacency(spx_map: np.ndarray, selected_ids, nseg: int,
                           targets: np.ndarray, max_protos: int,
                           include_onehot: bool) -> Tuple[np.ndarray, ...]:
    """Host-side prototype table + adjacency.

    spx_map: (H, W) int; selected_ids: iterable of selected spx ids;
    targets: (S, C) multi-hot. Returns
      proto_sid (NP,), proto_cls (NP,), proto_valid (NP,),
      proto_adj (NP, S) bool  — adjacency row of each prototype's owner
                                 (3x3 dilation reach, includes itself).
    """
    S, C = targets.shape
    sel = np.zeros(S, bool)
    sel[np.asarray(list(selected_ids), dtype=np.int64)] = True
    use = targets > 0
    if not include_onehot:
        use &= (targets.sum(1) > 1)[:, None]
    use &= sel[:, None]
    sid, cls = np.nonzero(use)
    if len(sid) > max_protos:
        sid, cls = sid[:max_protos], cls[:max_protos]
    NP = max_protos
    proto_sid = np.full(NP, S, np.int32)
    proto_cls = np.zeros(NP, np.int32)
    proto_valid = np.zeros(NP, bool)
    proto_sid[:len(sid)] = sid
    proto_cls[:len(cls)] = cls
    proto_valid[:len(sid)] = True

    # full adjacency from boundary pixels only: adjacency is symmetric
    # and reflexive, so 4 of the 8 shift directions plus a transpose
    # cover all pairs, and only pixels where the two ids DIFFER carry
    # information (~5-10% of the image). An np.unique(axis=0) over the
    # ~9*H*W raw pairs costs ~23 s/image at 1024x2048 (measured); the
    # 9 full-image scatters ~130 ms; this filtered form ~30 ms.
    adjp = np.zeros((S + 1, S + 1), bool)  # row/col S = out-of-range sink
    m = np.minimum(spx_map, S)
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        a = m[max(0, dy):m.shape[0] + min(0, dy),
              max(0, dx):m.shape[1] + min(0, dx)].reshape(-1)
        b = m[max(0, -dy):m.shape[0] + min(0, -dy),
              max(0, -dx):m.shape[1] + min(0, -dx)].reshape(-1)
        d = a != b
        adjp[a[d], b[d]] = True
    adj = adjp[:S, :S]
    adj |= adj.T
    np.fill_diagonal(adj, True)  # 3x3 dilation reach includes itself
    proto_adj = np.zeros((NP, S), bool)
    proto_adj[:len(sid)] = adj[sid]
    return proto_sid, proto_cls, proto_valid, proto_adj


@functools.partial(jax.jit, static_argnames=("nseg", "threshold_median",
                                             "chunk", "ignore_value",
                                             "propagate",
                                             "filter_within_by_pred",
                                             "filter_prop_by_pred",
                                             "sim_bf16"))
def cosine_prototype_plbl(feats, probs, spx, pixel_valid, proto_sid,
                          proto_cls, proto_valid, proto_adj, *, nseg: int,
                          threshold_median: bool = True, chunk: int = 65536,
                          ignore_value: int = 255, propagate: bool = True,
                          filter_within_by_pred: bool = False,
                          filter_prop_by_pred: bool = False,
                          sim_bf16: bool = False):
    """Single-image pseudo-label map.

    feats (P, Ch) L2-normalized; probs (P, C) softmax; spx (P,) int;
    pixel_valid (P,) bool (spmask, already restricted to multi-hot spxs
    unless include_onehot); proto_* from selected_spx_adjacency.
    Returns (P,) int32 labels with `ignore_value` where unassigned.

    filter_within_by_pred: keep within-superpixel assignments only where
    the model's top-1 prediction agrees, EXCEPT the prototype source
    pixels, which always take their prototype class — ties among a
    pixel's own prototypes resolve to the highest class, the reference's
    last-writer-wins order (eval_save_cosplbl_filtgt.py:176-184).
    filter_prop_by_pred: keep PROPAGATED assignments only where the
    model's top-1 prediction agrees (eval_save_cosplbl_prop_filtered.py:
    303-305); within-superpixel assignments are unfiltered.
    """
    P, Ch = feats.shape
    C = probs.shape[-1]
    NP = proto_sid.shape[0]
    S = nseg

    sid = jnp.where(pixel_valid, spx.astype(jnp.int32), S)
    _, argpix = segment_max_grad(probs.astype(jnp.float32), sid, S)

    src_pix = argpix[jnp.clip(proto_sid, 0, S - 1), proto_cls]  # (NP,)
    proto_ok = proto_valid & (src_pix < P) & (proto_sid < S)
    pf = jnp.take(feats, jnp.clip(src_pix, 0, P - 1), axis=0)
    pf = jnp.where(proto_ok[:, None], pf, 0.0).astype(jnp.float32)  # (NP, Ch)
    adj_t = proto_adj.T  # (S, NP)

    # the two (pixels x prototypes) similarity matmuls dominate the
    # device time at full res. An f32 dot lowers to 3 bf16 MXU passes on
    # TPU; with unit-norm features a single bf16 pass (f32 accumulate)
    # keeps similarities within ~4e-3 — below the noise of a network that
    # computed the features in bf16 to begin with, which is when the
    # generator enables this (cfg.dtype == bfloat16). Exactness tests and
    # the torch round-parity harness run with sim_bf16=False.
    pf_mm = pf.T.astype(jnp.bfloat16) if sim_bf16 else pf.T

    def _sim(cf):
        if sim_bf16:
            # cf arrives pre-cast (the padded feature tensor is stored
            # bf16 so both scan passes read half the HBM bytes)
            return jax.lax.dot(cf, pf_mm,
                               preferred_element_type=jnp.float32)
        return cf @ pf_mm

    pad = (-P) % chunk
    feats_p = jnp.pad(
        feats.astype(jnp.bfloat16 if sim_bf16 else jnp.float32),
        ((0, pad), (0, 0)))
    spx_p = jnp.pad(spx.astype(jnp.int32), (0, pad), constant_values=0)

    def pass1(carry, xs):
        cf, cs = xs
        sim = _sim(cf)  # (T, NP) cosine similarities on the MXU
        own = (proto_sid[None, :] == cs[:, None]) & proto_ok[None, :]
        s_own = jnp.where(own, sim, NEG)
        nn_sim = jnp.max(s_own, axis=-1)
        nn_proto = jnp.argmax(s_own, axis=-1).astype(jnp.int32)
        return carry, (nn_proto, nn_sim)

    fcs = feats_p.reshape(-1, chunk, Ch)
    scs = spx_p.reshape(-1, chunk)
    _, (nn_proto, nn_sim) = jax.lax.scan(pass1, 0, (fcs, scs))
    nn_proto = nn_proto.reshape(-1)[:P]
    nn_sim = nn_sim.reshape(-1)[:P]

    assigned = pixel_valid & (nn_sim > NEG / 2)
    key = jnp.where(assigned, nn_proto, NP)
    # one multi-operand sort (key primary, sim secondary) that CARRIES the
    # sim values — a lexsort-to-indices plus two (P,) gathers costs ~55 ms
    # at full res (profiled 2026-08-19: cosine_prop.py:174/175 fusions
    # 40.6 + 15.0 ms/image); the carried sort removes both gathers. The
    # per-group sim values are identical either way (sim is itself the
    # secondary key, so stability only permutes equal sims).
    sorted_key, sorted_sim = jax.lax.sort((key, nn_sim), dimension=0,
                                          is_stable=True, num_keys=2)
    ends = jnp.searchsorted(sorted_key, jnp.arange(NP, dtype=jnp.int32),
                            side="right").astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    count = ends - starts
    if threshold_median:
        # torch.median = lower middle element (eval_save_cosplbl_prop.py:247)
        pick = starts + jnp.maximum(count - 1, 0) // 2
    else:
        pick = starts
    thr = jnp.where(count > 0, sorted_sim[jnp.clip(pick, 0, P - 1)], 1.0)

    pred_cls = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # model top-1
    pred_p = jnp.pad(pred_cls, (0, pad), constant_values=0)

    def pass2(carry, xs):
        cf, cs, cp = xs
        sim = _sim(cf)  # (T, NP)
        cand = jnp.take(adj_t, cs, axis=0) & proto_ok[None, :]  # (T, NP)
        passing = cand & (sim > thr[None, :])
        src = jnp.max(jnp.where(passing, proto_sid[None, :], -1), axis=-1)
        has = src >= 0
        lbl_mask = cand & (proto_sid[None, :] == src[:, None])
        s_lbl = jnp.where(lbl_mask, sim, NEG)
        j = jnp.argmax(s_lbl, axis=-1)
        lbl = proto_cls[j]
        if filter_prop_by_pred:
            has = has & (lbl == cp)
        return carry, jnp.where(has, lbl, ignore_value).astype(jnp.int32)

    if propagate:
        _, prop = jax.lax.scan(pass2, 0, (fcs, scs, pred_p.reshape(-1, chunk)))
        plbl = prop.reshape(-1)[:P]
    else:
        # eval_save_cosplbl_withinspx variant: no neighborhood propagation
        plbl = jnp.full((P,), ignore_value, jnp.int32)
    within = proto_cls[nn_proto]
    if filter_within_by_pred:
        # prototype source pixels always keep their class (highest wins)
        proto_lbl = jnp.full((P + 1,), -1, jnp.int32).at[
            jnp.where(proto_ok, src_pix, P)].max(
            proto_cls.astype(jnp.int32))[:P]
        within = jnp.where(proto_lbl >= 0, proto_lbl, within)
        assigned = assigned & ((pred_cls == within) | (proto_lbl >= 0))
    plbl = jnp.where(assigned, within, plbl)
    return plbl.astype(jnp.int32)
