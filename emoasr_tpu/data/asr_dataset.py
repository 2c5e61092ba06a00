"""ASR dataset: TSV manifests + .npy features -> static-shape numpy batches.

Parity target: `/root/reference/asr/datasets.py:25-186` — same manifest
contract (columns `feat_path, utt_id, token_id, text, xlen, ylen
[, phone_token_id, phone_text]`), frame stacking, <sos>/<eos> framing in
collate (ys_in/ys_out padded with eos), KD soft-label expansion from the
top-k pickle format of `asr/distill/make_label.py`.

TPU-first differences: SpecAugment is NOT applied here — it runs on device
inside the jitted train step (`emoasr_tpu.ops.specaug`), keeping the host
path IO-only; batches are padded to fixed buckets (see batching.py).
"""

from __future__ import annotations

import logging
import pickle
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from emoasr_tpu.config import ExpConfig
from emoasr_tpu.data.batching import (
    BucketBatcher,
    derive_buckets,
    pad_to,
)
from emoasr_tpu.utils.converters import get_utt_id_nosp, str2ints


def stack_frames(x: np.ndarray, num_framestacks: int) -> np.ndarray:
    """(T, F) -> (T//n, F*n) (datasets.py:135-143)."""
    new_len = x.shape[0] // num_framestacks
    return x[: new_len * num_framestacks].reshape(
        new_len, x.shape[1] * num_framestacks
    )


def create_soft_label(
    data_kd_utt, ylen: int, vocab_size: int, lsm_prob: float, add_eos: bool,
    eos_id: int = 2,
) -> np.ndarray:
    """Expand top-k (v, p) pairs into a dense (ylen[+1], V) soft-label
    matrix (datasets.py:248-263)."""
    L = ylen + 1 if add_eos else ylen
    soft = np.zeros((L, vocab_size), np.float32)
    for i, topk in enumerate(data_kd_utt):
        if i >= L:
            break
        soft[i, :] = lsm_prob / (vocab_size - len(topk))
        for v, prob in topk:
            soft[i, int(v)] = float(prob) * (1 - lsm_prob)
    if add_eos:
        soft[-1, :] = lsm_prob / (vocab_size - 1)
        soft[-1, eos_id] = 1.0 * (1 - lsm_prob)
    return soft


class ASRDataset:
    def __init__(
        self,
        cfg: ExpConfig,
        data_path: str,
        phase: str = "train",
        size: int = -1,
        decode_phone: bool = False,
        kd_label_path: Optional[str] = None,
    ):
        self.cfg = cfg
        self.phase = phase
        self.data = pd.read_table(data_path)
        self.use_phone = (
            phase == "train" and cfg.mtl_phone_ctc_weight > 0
        ) or decode_phone
        cols = ["feat_path", "utt_id", "token_id", "text", "xlen", "ylen"]
        if self.use_phone:
            cols += ["phone_token_id", "phone_text"]
        self.data = self.data[cols]
        if size > 0:
            self.data = self.data[:size]

        self.use_kd = cfg.kd_weight > 0 or cfg.inter_kd_weight > 0
        self.data_kd = None
        if phase == "train" and self.use_kd and kd_label_path:
            with open(kd_label_path, "rb") as f:
                self.data_kd = pickle.load(f)
            logging.info(f"kd labels: {kd_label_path}")
        self.add_eos = cfg.decoder_type in ("transformer", "las")

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int, load_x: bool = True) -> Dict:
        cfg = self.cfg
        row = self.data.iloc[idx]
        if load_x:
            x = np.load(row["feat_path"])[:, : cfg.feat_dim].astype(np.float32)
        else:
            x = np.zeros((0, cfg.feat_dim), np.float32)
        # NOTE: frame stacking happens on device after SpecAugment (train)
        # to keep the reference's specaug->stack order; here only for eval
        # paths that never see specaug.
        y = np.asarray(str2ints(row["token_id"]), np.int32)
        ex = {
            "utt_id": row["utt_id"],
            "text": row["text"],
            "x": x,
            "xlen": x.shape[0],
            "y": y,
            "ylen": len(y),
        }
        if self.use_phone:
            p = np.asarray(str2ints(row["phone_token_id"]), np.int32)
            ex["p"] = p
            ex["plen"] = len(p)
            ex["ptext"] = row["phone_text"]
        if self.data_kd is not None:
            utt_nosp = get_utt_id_nosp(row["utt_id"])
            kd_utt = self.data_kd.get(utt_nosp, [])
            if not kd_utt:
                logging.warning(f"soft label: {utt_nosp} not found")
            ex["soft_label"] = create_soft_label(
                kd_utt, len(y), cfg.vocab_size, cfg.lsm_prob,
                add_eos=self.add_eos, eos_id=cfg.eos_id,
            )
        return ex

    # ---- batching ----

    def make_batcher(self, shuffle: Optional[bool] = None, seed: int = 0,
                     drop_tail: Optional[bool] = None) -> BucketBatcher:
        cfg = self.cfg
        n = cfg.num_framestacks
        # manifest xlen is post-framestack (datasets.py:101); raw = xlen * n
        buckets = derive_buckets(
            [(t * n, u) for t, u in cfg.buckets],
            cfg.max_xlens_batch * n,
            cfg.max_ylens_batch,
            cfg.batch_size,
        )
        if shuffle is None:
            shuffle = self.phase == "train" and cfg.train_data_shuffle
        if drop_tail is None:
            drop_tail = self.phase == "train"
        # manifest xlen is the RAW frame count (sort_bylen/prep_tsv write
        # len(np.load(...))); the reference only converts to post-stack
        # length inside __getitem__ (datasets.py:101).  Bucket caps above
        # are already converted to raw frames (t * n).
        return BucketBatcher(
            self.data["xlen"].values,
            self.data["ylen"].values,
            buckets,
            shuffle=shuffle,
            seed=seed,
            drop_tail=drop_tail,
        )

    def collate(
        self,
        indices: List[int],
        max_xlen: int,
        max_ylen: int,
        pad_to_batch: Optional[int] = None,
    ) -> Dict:
        """Build one fixed-shape batch.

        With `pad_to_batch=B`, an undersized tail group is padded to B rows
        by repeating the first utterance, so every batch of a bucket
        compiles to ONE program shape.  `utt_ids`/`texts` keep the true
        length (`n_valid` rows), so per-utterance consumer loops
        (`for b, utt_id in enumerate(batch["utt_ids"])`) never see the
        duplicated rows and WER aggregation is unaffected.

        Uses the native multithreaded .npy batch loader when built
        (emoasr_tpu/native/batch_loader.cpp)."""
        cfg = self.cfg
        n_valid = len(indices)
        if pad_to_batch is not None and n_valid < pad_to_batch:
            indices = list(indices) + [indices[0]] * (pad_to_batch - n_valid)
        try:
            from emoasr_tpu import native as _native

            use_native = _native.available()
        except Exception:  # pragma: no cover
            use_native = False

        B = len(indices)
        eos = cfg.eos_id
        if use_native:
            paths = [self.data.iloc[i]["feat_path"] for i in indices]
            xs, xl = _native.load_feat_batch_native(
                paths, max_xlen, cfg.feat_dim
            )
            exs = [self.__getitem__(i, load_x=False) for i in indices]
            xlens = xl.astype(np.int32)
        else:
            exs = [self[i] for i in indices]
            xs = pad_to([e["x"] for e in exs], max_xlen, 0.0)
            xlens = np.asarray([e["xlen"] for e in exs], np.int32)
        ys = pad_to([e["y"] for e in exs], max_ylen, eos)
        ylens = np.asarray([e["ylen"] for e in exs], np.int32)

        # <sos>/<eos> framing (datasets.py:158-176)
        ys_in = np.full((B, max_ylen + 1), eos, np.int32)
        ys_out = np.full((B, max_ylen + 1), eos, np.int32)
        for b, e in enumerate(exs):
            n = e["ylen"]
            ys_in[b, 1 : 1 + n] = e["y"][:n]
            ys_out[b, :n] = e["y"][:n]
            ys_out[b, n] = eos

        batch = {
            "utt_ids": [e["utt_id"] for e in exs[:n_valid]],
            "texts": [e["text"] for e in exs[:n_valid]],
            "n_valid": n_valid,
            "xs": xs,
            "xlens": xlens,
            "ys": ys.astype(np.int32),
            "ylens": ylens,
            "ys_in": ys_in,
            "ys_out": ys_out,
        }
        if self.use_phone:
            peos = cfg.phone_eos_id if cfg.phone_eos_id is not None else eos
            # phone sequences are typically much longer than BPE token
            # sequences; pad to the batch's own phone length rounded up to
            # a multiple of 32 (bounded shape set), NOT the word cap
            max_plen = max(int(e["plen"]) for e in exs)
            max_plen = ((max_plen + 31) // 32) * 32
            batch["ps"] = pad_to([e["p"] for e in exs], max_plen, peos).astype(
                np.int32
            )
            batch["plens"] = np.asarray([e["plen"] for e in exs], np.int32)
            batch["ptexts"] = [e["ptext"] for e in exs]
        if self.data_kd is not None:
            L = max_ylen + 1 if self.add_eos else max_ylen
            batch["soft_labels"] = pad_to(
                [e["soft_label"] for e in exs], L, 0.0
            )
        return batch

    def batches(
        self, batcher: Optional[BucketBatcher] = None, seed: int = 0
    ) -> Iterator[Dict]:
        if batcher is None:
            batcher = self.make_batcher(seed=seed)
        n = self.cfg.num_framestacks
        for bi, indices in batcher:
            b = batcher.buckets[bi]
            yield self.collate(
                indices, b.max_xlen, b.max_ylen, pad_to_batch=b.batch_size
            )
