"""Host-side batching / tokenization / device-feed pipeline.

TPU-native replacement for the reference's torch DataLoader +
DistributedSampler stack (`base/base_data_loader.py`,
`data_loader/data_loader.py`): a process-pool map over dataset indices with
per-epoch host sharding, a tokenizer adapter, and an async prefetcher that
overlaps host decode with device compute (double-buffering into HBM).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class HostShardSampler:
    """Deterministic per-epoch shuffling + host sharding.

    Equivalent of torch DistributedSampler(set_epoch) (`base_data_loader.py:130`,
    `trainer_egoclip.py:104`): every host sees a disjoint 1/num_hosts slice of
    a seed+epoch-keyed permutation, padded to equal length.
    """

    def __init__(self, length: int, num_hosts: int = 1, host_id: int = 0,
                 shuffle: bool = True, seed: int = 0):
        self.length = length
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.shuffle = shuffle
        self.seed = seed

    def indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.length)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        per_host = -(-self.length // self.num_hosts)
        pad = per_host * self.num_hosts - self.length
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.host_id::self.num_hosts]


def default_collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # e.g. raw caption strings
    return out


class Tokenizer:
    """Thin adapter over a HF tokenizer, with an offline fallback.

    The pretrain recipe tokenizes with roberta-base at max_length 15
    (`trainer_egoclip.py:120`); fine-tunes use 30 (`trainer_epic.py:134`).
    When the HF tokenizer can't be loaded (no cache, no network), a
    deterministic hash tokenizer with RoBERTa's special-token ids stands in
    so offline smoke/perf runs still exercise the full pipeline.
    """

    # RoBERTa special ids (roberta-base tokenizer config)
    BOS, PAD, EOS, MASK, VOCAB = 0, 1, 2, 50264, 50265

    def __init__(self, name_or_path: str = "roberta-base", max_len: int = 15,
                 allow_fallback: bool = True, vocab_cap: Optional[int] = None):
        self.max_len = max_len
        self.vocab_cap = vocab_cap  # clamp ids for small-vocab smoke models
        self._tok = None
        try:
            from transformers import AutoTokenizer

            try:
                # cache-only first: avoids multi-second network retry loops
                # in offline environments
                self._tok = AutoTokenizer.from_pretrained(
                    name_or_path, local_files_only=True)
            except Exception:
                self._tok = AutoTokenizer.from_pretrained(name_or_path)
        except Exception:
            if not allow_fallback:
                raise

    def _fallback(self, texts: Sequence[str]) -> Dict[str, np.ndarray]:
        import zlib

        L = self.max_len
        ids = np.full((len(texts), L), self.PAD, np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for r, text in enumerate(texts):
            toks = [self.BOS]
            for w in str(text).split():
                if len(toks) >= L - 1:
                    break
                # stable word -> id, avoiding the special ids
                toks.append(4 + zlib.crc32(w.lower().encode()) % (self.MASK - 8))
            toks.append(self.EOS)
            ids[r, : len(toks)] = toks[:L]
            mask[r, : len(toks)] = 1
        return {"text_ids": ids, "text_mask": mask}

    def _cap(self, out: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.vocab_cap is not None and self.vocab_cap < self.VOCAB:
            ids = out["text_ids"]
            out["text_ids"] = np.where(
                ids < self.vocab_cap, ids, 4 + ids % max(self.vocab_cap - 4, 1)
            ).astype(np.int32)
        return out

    def __call__(self, texts: Sequence[str]) -> Dict[str, np.ndarray]:
        if self._tok is None:
            return self._cap(self._fallback(texts))
        enc = self._tok(
            list(texts), padding="max_length", truncation=True,
            max_length=self.max_len, return_tensors="np",
        )
        return self._cap({
            "text_ids": enc["input_ids"].astype(np.int32),
            "text_mask": enc["attention_mask"].astype(np.int32),
        })


class DataLoader:
    """Threaded prefetch loader: dataset[i] -> collate -> (optional) post_fn.

    `num_workers` threads decode items concurrently (cv2/ffmpeg release the
    GIL); a coordinator thread keeps `prefetch` whole batches in flight and
    preserves batch order, so consumers see the same stream a sequential
    loader would produce. Threads, not processes: the hot path is C code
    that releases the GIL — the decoder, and (when built) the C++ videoproc
    library that transforms.py routes resize/normalize through.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[HostShardSampler] = None,
        num_workers: int = 4,
        collate: Callable = default_collate,
        post_fn: Optional[Callable] = None,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or HostShardSampler(len(dataset), shuffle=False)
        self.num_workers = max(num_workers, 1)
        self.collate = collate
        self.post_fn = post_fn
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.sampler.indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        idx = self.sampler.indices(epoch)
        n_batches = len(self)
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as ex:
                    # keep `prefetch + 1` whole batches of item-futures in
                    # flight; batches complete in submission order so the
                    # output stream is deterministic.
                    pending: collections.deque = collections.deque()
                    batch_iter = iter(batches)

                    def submit_one() -> bool:
                        batch_idx = next(batch_iter, None)
                        if batch_idx is None:
                            return False
                        pending.append(
                            [ex.submit(self.dataset.__getitem__, int(i))
                             for i in batch_idx]
                        )
                        return True

                    for _ in range(self.prefetch + 1):
                        if not submit_one():
                            break
                    while pending and not stop.is_set():
                        futs = pending.popleft()
                        items = [f.result() for f in futs]
                        submit_one()
                        batch = self.collate(items)
                        if self.post_fn is not None:
                            batch = self.post_fn(batch)
                        # bounded put with a stop check so an abandoned
                        # generator can't wedge the producer forever
                        while not stop.is_set():
                            try:
                                q.put(batch, timeout=0.2)
                                break
                            except queue.Full:
                                continue
                    for futs in pending:
                        for f in futs:
                            f.cancel()
            finally:
                while True:
                    try:
                        q.put(None, timeout=0.2)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


def device_prefetch(batches: Iterator, put_fn: Callable, depth: int = 2):
    """Overlap host->device transfer with device compute (VERDICT r4 task 4).

    A feeder thread runs `put_fn` (typically `shard_batch`) up to `depth`
    batches ahead of consumption. `jax.device_put` over the tunnel blocks
    its calling thread while the bytes ship, so issuing it inline in the
    train loop serializes transfer with dispatch — the round-4 feed bench
    measured the FULL per-step H2D time (165 ms of a 543 ms step) exposed
    despite the loader's host-side prefetch. Moving the put to a feeder
    thread lets batch N+1's transfer ride under step N's compute; depth 2
    keeps one batch resident + one in flight (2x batch HBM headroom).

    Exceptions from `put_fn` or the source iterator re-raise at the
    consumer's next pull; abandoning the generator unblocks the feeder.
    """
    if depth <= 0:
        for b in batches:
            yield put_fn(b)
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    DONE = object()

    def feeder():
        try:
            for b in batches:
                item = (False, put_fn(b))
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raise on the consumer side
            item = (True, e)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue
            return
        while not stop.is_set():
            try:
                q.put(DONE, timeout=0.2)
                break
            except queue.Full:
                continue

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is DONE:
                break
            is_err, val = item
            if is_err:
                raise val
            yield val
    finally:
        stop.set()


class RoundRobinLoader:
    """Alternate batches across several loaders per step
    (base_data_loader.py:142 BaseMultiDataLoader)."""

    def __init__(self, loaders: Sequence[DataLoader]):
        self.loaders = list(loaders)

    def __len__(self):
        return sum(len(l) for l in self.loaders)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        iters = [l.epoch(epoch) for l in self.loaders]
        live = list(range(len(iters)))
        i = 0
        while live:
            idx = live[i % len(live)]
            try:
                yield next(iters[idx])
                i += 1
            except StopIteration:
                live.remove(idx)


def pretrain_post_fn(tokenizer: Tokenizer, mlm_prob: float = 0.15, seed: int = 0):
    """Tokenize (incl. scene negatives concat, trainer_egoclip.py:112-116)
    and apply MLM masking.

    MLM ids/labels must stay inside the MODEL's vocab: small-vocab smoke
    configs (tokenizer.vocab_cap set) would otherwise get the RoBERTa
    mask id 50264 and NaN out through the embedding lookup."""
    from egovlpv2_tpu.data.mlm import mask_tokens

    vocab = tokenizer.vocab_cap or Tokenizer.VOCAB
    mask_id = min(Tokenizer.MASK, vocab - 1)
    rng = np.random.default_rng(seed)

    def post(batch: Dict[str, Any]) -> Dict[str, Any]:
        texts = list(batch.pop("text"))
        out = dict(batch)
        if "text_neg" in batch:
            # concat scene negatives along batch (doubles effective batch)
            texts = texts + list(out.pop("text_neg"))
            out["video"] = np.concatenate([out["video"], out.pop("video_neg")])
            out["noun_vec"] = np.concatenate([out["noun_vec"], out.pop("noun_vec_neg")])
            out["verb_vec"] = np.concatenate([out["verb_vec"], out.pop("verb_vec_neg")])
        tok = tokenizer(texts)
        out.update(tok)
        mlm_ids, mlm_labels = mask_tokens(tok["text_ids"], rng, mlm_prob,
                                          mask_id=mask_id, vocab_size=vocab)
        out["text_mlm_ids"] = mlm_ids.astype(np.int32)
        out["text_mlm_labels"] = mlm_labels.astype(np.int32)
        return out

    return post
