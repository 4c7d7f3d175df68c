"""Tiny byte-level LM: training + accuracy evidence on real learned weights.

The reference's reason to exist is an accuracy claim: unstructured KV pruning
at 50-70% sparsity preserves long-context task quality
(pred_long_bench.py:49-86, eval_long_bench.py:66-75).  This environment ships
no pretrained checkpoints and has no egress, so the accuracy evidence is
produced the only honest way available: train a small Llama-architecture
model *with this framework* on local text plus a synthetic passkey-retrieval
task (the long-context retrieval probe popularized by the Landmark/LongRoPE
line of work), then score dense vs pruned caches through the production
engine and the real LongBench harness machinery (predict -> jsonl -> scorer).

Passkey retrieval is the sharpest miniature of the paper's claim: the answer
lives in exactly one K/V row pair far outside the residual window, so the
pruned+compressed cache must preserve it end to end.

Components:
  * ByteTokenizer        — HF-compatible-enough byte tokenizer (no downloads)
  * load_corpus          — local text corpus (installed python sources/docs)
  * make_passkey_row     — needle-in-haystack sample in LongBench row schema
  * train                — jitted AdamW training loop (lax.scan over steps)
  * score_nll            — teacher-forced NLL through the real decode path
  * run_accuracy         — dense vs pruned grid -> result dict
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                 PruneConfig, PruneMethod)

VOCAB = 258          # 256 bytes + BOS(256) + EOS(257)
BOS_ID, EOS_ID = 256, 257

# Llama-architecture; head_dim=128 so the compressed fused-stream format
# applies (cache/compressed.py asserts head_dim == 128).
TINY_ACC = ModelConfig(
    name="tiny-acc", vocab_size=VOCAB, hidden_size=256, intermediate_size=768,
    num_layers=4, num_heads=4, num_kv_heads=2, head_dim=128,
    rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=4096,
)

PASSKEY_QUESTION = "\n\nWhat is the pass key? The pass key is"
NEEDLE = " The pass key is {key}. Remember it. {key} is the pass key. "


class ByteTokenizer:
    """UTF-8 byte tokenizer with the subset of the HF API the harness uses."""

    eos_token_id = EOS_ID
    bos_token_id = BOS_ID

    def encode(self, text: str, add_special_tokens: bool = False):
        ids = list(text.encode("utf-8", errors="replace"))
        return [BOS_ID] + ids if add_special_tokens else ids

    def decode(self, ids, skip_special_tokens: bool = True):
        arr = [int(i) for i in np.asarray(ids).reshape(-1) if int(i) < 256]
        return bytes(arr).decode("utf-8", errors="replace")

    def __call__(self, text: str, truncation: bool = False,
                 return_tensors: Optional[str] = None):
        ids = self.encode(text)

        class _Enc:
            pass

        enc = _Enc()
        if return_tensors == "np":
            enc.input_ids = np.asarray([ids], np.int32)
        else:
            enc.input_ids = ids
        return enc


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------

_CORPUS_ROOTS = [
    "/usr/lib/python3.11", "/usr/lib/python3.10", "/usr/lib/python3.12",
    "/opt/venv/lib",
]


def load_corpus(max_bytes: int = 6_000_000, seed: int = 0) -> str:
    """Concatenate local text (python sources) into one training corpus."""
    files = []
    for root in _CORPUS_ROOTS:
        if os.path.isdir(root):
            files.extend(sorted(glob.glob(os.path.join(root, "**/*.py"),
                                          recursive=True))[:4000])
        if len(files) > 6000:
            break
    rng = np.random.RandomState(seed)
    rng.shuffle(files)
    parts, total = [], 0
    for p in files:
        try:
            with open(p, encoding="utf-8", errors="ignore") as f:
                t = f.read()
        except OSError:
            continue
        parts.append(t)
        total += len(t)
        if total >= max_bytes:
            break
    text = "\n\n".join(parts)
    assert len(text) > 100_000, "corpus too small"
    return text


def _filler(corpus: str, rng: np.random.RandomState, n: int) -> str:
    start = rng.randint(0, max(1, len(corpus) - n - 1))
    return corpus[start:start + n]


def make_passkey_row(corpus: str, rng: np.random.RandomState,
                     ctx_bytes: int, depth: Optional[float] = None) -> dict:
    """LongBench-schema row: the needle at a random (or fixed) relative depth."""
    key = "".join(str(rng.randint(0, 10)) for _ in range(5))
    needle = NEEDLE.format(key=key)
    body = ctx_bytes - len(needle)
    d = rng.uniform(0.1, 0.85) if depth is None else depth
    pre = _filler(corpus, rng, int(body * d))
    post = _filler(corpus, rng, body - int(body * d))
    context = pre + needle + post
    return {"context": context, "input": "", "answers": [key],
            "all_classes": None, "length": len(context)}


def make_training_batch(corpus: str, rng: np.random.RandomState,
                        batch: int, seq: int, passkey_frac: float = 0.5):
    """Returns (tokens [B, seq] int32, weights [B, seq] f32).

    Mixture of plain text windows and passkey documents; the passkey answer
    span gets upweighted loss so the copy behaviour trains quickly."""
    toks = np.zeros((batch, seq), np.int32)
    wts = np.ones((batch, seq), np.float32)
    for b in range(batch):
        if rng.rand() < passkey_frac:
            ctx_bytes = rng.randint(seq // 4, seq - 64)
            row = make_passkey_row(corpus, rng, ctx_bytes)
            doc = row["context"] + PASSKEY_QUESTION + " " + row["answers"][0]
            ids = [BOS_ID] + list(doc.encode("utf-8", errors="replace"))[:seq - 2] + [EOS_ID]
            # answer span = last 6 bytes (" " + 5 digits) + EOS
            ids = ids[:seq]
            toks[b, :len(ids)] = ids
            span = min(7, len(ids) - 1)
            wts[b, len(ids) - span:len(ids)] = 8.0
            if len(ids) < seq:  # tail: more text, ordinary LM loss
                tail = _filler(corpus, rng, seq - len(ids))
                tids = list(tail.encode("utf-8", errors="replace"))[: seq - len(ids)]
                toks[b, len(ids):len(ids) + len(tids)] = tids
        else:
            window = _filler(corpus, rng, seq + 8)
            ids = ([BOS_ID] + list(window.encode("utf-8", errors="replace")))[:seq]
            toks[b, :len(ids)] = ids
    return toks, wts


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def train(out_dir: str, steps: int = 3000, batch: int = 8, seq: int = 2048,
          lr: float = 1e-3, seed: int = 0, inner: int = 25,
          hidden: int = None, layers: int = None, window: int = None,
          rope_theta: float = None, log=print) -> dict:
    import optax

    from mustafar_tpu.models import llama

    cfg = TINY_ACC
    if hidden or layers:
        # longer-context retrieval needs more induction capacity than the
        # default 4-layer/256-hidden model (measured: it retrieves ~100% at
        # 1.6k-byte contexts but chance-level at 3.6k)
        cfg = dataclasses.replace(
            cfg, hidden_size=hidden or cfg.hidden_size,
            intermediate_size=3 * (hidden or cfg.hidden_size),
            num_layers=layers or cfg.num_layers,
            name=f"tiny-acc-h{hidden or cfg.hidden_size}"
                 f"L{layers or cfg.num_layers}")
    if seq * 2 > cfg.max_position_embeddings:
        # 8k-context training (round 5): positions must cover the eval
        # context (ctx + question + generation headroom)
        cfg = dataclasses.replace(cfg, max_position_embeddings=2 * seq)
    if rope_theta:
        cfg = dataclasses.replace(cfg, rope_theta=float(rope_theta))
    if window:
        # Mistral-semantics model: sliding-window attention in training AND
        # inference (lm_forward and all cache impls honor cfg.sliding_window;
        # reference mistral_mustafar_Kt_Mag_Vt_Mag.py:983-989).  Retrieval
        # beyond the window relies on layer-relay (receptive field ~L*W).
        cfg = dataclasses.replace(cfg, sliding_window=window,
                                  name=f"{cfg.name}-sw{window}")
    corpus = load_corpus(seed=seed)
    rng = np.random.RandomState(seed)
    params = llama.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    warmup = min(100, max(1, steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup,
                                               max(steps, warmup + 1),
                                               lr * 0.05)
    opt = optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(params, toks, wts):
        # remat: 8k x h768 x L12 training OOMs (29 GiB) without it
        logits = llama.lm_forward(cfg, params, toks, remat=True)
        ls = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], toks[:, 1:])
        w = wts[:, 1:]
        return (ls * w).sum() / w.sum()

    @jax.jit
    def train_chunk(params, opt_state, toks, wts):
        def one(carry, batch_):
            params, opt_state = carry
            t, w = batch_
            loss, grads = jax.value_and_grad(loss_fn)(params, t, w)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), (toks, wts))
        return params, opt_state, losses

    done = 0
    last = None
    while done < steps:
        k = min(inner, steps - done)
        bt, bw = zip(*[make_training_batch(corpus, rng, batch, seq)
                       for _ in range(k)])
        bt, bw = np.stack(bt), np.stack(bw)
        params, opt_state, losses = train_chunk(
            params, opt_state, jnp.asarray(bt), jnp.asarray(bw))
        done += k
        last = float(np.asarray(losses)[-1])
        log(f"step {done}/{steps}  loss {np.asarray(losses).mean():.4f} "
            f"(last {last:.4f})")
    save_ckpt(out_dir, cfg, params)
    return {"final_loss": last, "steps": steps}


def save_ckpt(out_dir: str, cfg: ModelConfig, params) -> None:
    os.makedirs(out_dir, exist_ok=True)
    flat = {"/".join(map(str, path)): np.asarray(v) for path, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(os.path.join(out_dir, "params.npz"),
             **{k.replace("[", "").replace("]", "").replace("'", ""): v
                for k, v in flat.items()})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_ckpt(out_dir: str, dtype=jnp.float32):
    with open(os.path.join(out_dir, "config.json")) as f:
        cfg = ModelConfig(**json.load(f))
    data = np.load(os.path.join(out_dir, "params.npz"))

    params = {"embed": None, "final_norm": None, "layers": {}}
    for k in data.files:
        parts = [p for p in k.split("/") if p]
        v = jnp.asarray(data[k], dtype)
        if len(parts) == 1:
            params[parts[0]] = v
        else:
            params.setdefault(parts[0], {})[parts[1]] = v
    assert params["embed"] is not None
    return cfg, params


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------

def _engine(cfg: ModelConfig, mode: str, sparsity: float,
            max_seq_len: int) -> EngineConfig:
    """Grid-mode grammar (each mode string names one engine variant):

        dense
        (masked|compressed)[-<codec>][:<method>][+chunked][+r<N>][+c<N>]

    ``codec``: bitmap (default) | q8 | q8q4 (compressed only).
    ``method``: a PruneMethod value (default kt_mag_vt_mag) — this is how the
    Opa/ThinK variants enter the accuracy grid.
    ``+chunked``: chunked (segment-streamed) prefill (compressed only);
    ``+rN`` / ``+cN``: residual window / compaction chunk size overrides for
    the residual-window sensitivity study.
    Examples: ``masked:kt_mag_vt_opa``, ``compressed-q8q4:kt_opa_vt_mag+chunked``,
    ``compressed-q8q4+r64+c128``.
    """
    if mode == "dense":
        return EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                            max_seq_len=max_seq_len)
    parts = mode.split("+")
    base, flags = parts[0], parts[1:]
    method = "kt_mag_vt_mag"
    if ":" in base:
        base, method = base.split(":", 1)
    codec = "bitmap"
    if base.startswith("compressed-"):
        base, codec = base.split("-", 1)
    assert base in ("masked", "compressed"), mode
    chunked, residual, chunk = False, 32, 256
    for f in flags:
        if f == "chunked":
            chunked = True
        elif f[:1] == "r":
            residual = int(f[1:])
        elif f[:1] == "c":
            chunk = int(f[1:])
        else:
            raise ValueError(f"unknown grid-mode flag {f!r} in {mode!r}")
    cache = CacheMode.MASKED if base == "masked" else CacheMode.COMPRESSED
    return EngineConfig(
        model=cfg, cache_mode=cache,
        prune=PruneConfig(method=PruneMethod(method), k_sparsity=sparsity,
                          v_sparsity=sparsity, residual_length=residual),
        max_seq_len=max_seq_len, codec=codec, chunk_size=chunk,
        chunked_prefill=chunked)


def score_nll(engine: EngineConfig, params, tokens: np.ndarray,
              prefill_len: int = 256, dtype=jnp.float32):
    """Teacher-forced scoring through the production prefill+decode path.

    tokens [B, T].  Prefills the first `prefill_len` tokens, then decodes the
    rest one step at a time with the engine's cache (pruning and chunk
    compaction included).  Returns (mean NLL over positions >= prefill_len,
    fp32 logits [B, T - prefill_len, V] for distribution comparisons).
    """
    from mustafar_tpu.cache import make_cache
    from mustafar_tpu.models import llama

    cfg = engine.model
    impl = make_cache(engine)
    B, T = tokens.shape
    P = prefill_len
    n_dec = T - P
    has_compact = hasattr(impl, "compact")

    @jax.jit
    def run(params, toks):
        cache = impl.init(B, dtype)
        if engine.chunked_prefill:
            _, cache = llama.prefill_chunked(cfg, params, toks[:, :P], cache,
                                             impl, jnp.int32(P))
        else:
            _, cache = llama.prefill(cfg, params, toks[:, :P], cache, impl,
                                     jnp.int32(P), last_only=True)
        logits_buf = jnp.zeros((B, n_dec, cfg.vocab_size), jnp.float32)

        def step(state):
            i, cache, buf = state
            pos = P + i - 1                       # position of the fed token
            tok = jax.lax.dynamic_slice_in_dim(toks, pos, 1, axis=1)
            lg, cache = llama.decode_step(cfg, params, tok, cache, impl, pos)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, lg.astype(jnp.float32), i, axis=1)
            return i + 1, cache, buf

        if has_compact:
            C, r = impl.C, impl.r

            def window_full(i, cache):
                total = P + i - 1
                nc0 = cache["n_chunks"][0][0]
                return (total - nc0 * C) >= (r + C)

            def inner_cond(state):
                i, cache, _ = state
                return jnp.logical_and(i <= n_dec, ~window_full(i, cache))

            def outer_body(state):
                state = jax.lax.while_loop(inner_cond,
                                           lambda s: step(s), state)
                i, cache, buf = state
                cache = jax.lax.cond(window_full(i, cache), impl.compact,
                                     lambda c: c, cache)
                return (i, cache, buf)

            state = jax.lax.while_loop(lambda s: s[0] <= n_dec, outer_body,
                                       (jnp.int32(1), cache, logits_buf))
        else:
            state = jax.lax.while_loop(
                lambda s: s[0] <= n_dec, step, (jnp.int32(1), cache, logits_buf))
        _, _, buf = state
        # buf[:, i] predicts token P + i; NLL over those targets
        targets = jax.lax.dynamic_slice_in_dim(toks, P, n_dec, axis=1)
        lp = jax.nn.log_softmax(buf, axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        return nll.mean(), buf

    nll, logits = run(params, jnp.asarray(tokens, jnp.int32))
    return float(nll), logits


def kl_vs(logits_ref, logits_other) -> float:
    """mean KL(ref || other) over all scored positions."""
    p = jax.nn.log_softmax(logits_ref, -1)
    q = jax.nn.log_softmax(logits_other, -1)
    kl = jnp.sum(jnp.exp(p) * (p - q), axis=-1)
    return float(kl.mean())


# ---------------------------------------------------------------------------
# Accuracy grid
# ---------------------------------------------------------------------------

def run_accuracy(ckpt_dir: str, out_dir: str, n_rows: int = 40,
                 ctx_bytes: int = 1600, sparsities=(0.5, 0.7),
                 modes=("masked", "compressed"), seed: int = 1234,
                 nll_tokens: int = 1024, depths=None, log=print) -> dict:
    """Dense vs pruned accuracy grid on the trained tiny model.

    Passkey retrieval runs through the real harness (predict_dataset ->
    jsonl -> scorer with the 'passkey' digit-EM metric); NLL/KL run through
    score_nll (production decode path).  Writes <out_dir>/result.json.

    ``depths``: optional tuple of needle depths (fractions into the
    context).  When given, rows are placed at those fixed depths round-robin
    and each variant additionally reports per-depth accuracy
    (needle-in-a-haystack breakdown — the standard long-context probe).
    """
    from mustafar_tpu.harness.longbench import PredictConfig, predict_dataset, scorer
    from mustafar_tpu.runtime.generate import Generator

    cfg, params = load_ckpt(ckpt_dir)
    corpus = load_corpus(seed=seed + 1)
    rng = np.random.RandomState(seed)
    tok = ByteTokenizer()

    if depths:
        row_depths = [depths[i % len(depths)] for i in range(n_rows)]
        rows = [make_passkey_row(corpus, rng, ctx_bytes, depth=d)
                for d in row_depths]
    else:
        row_depths = None
        rows = [make_passkey_row(corpus, rng, ctx_bytes) for _ in range(n_rows)]
    # held-out text for NLL (disjoint seed from training)
    nll_toks = np.stack([
        np.asarray([BOS_ID] + list(_filler(corpus, rng, nll_tokens + 8)
                                   .encode("utf-8", "replace"))[:nll_tokens - 1],
                   np.int32)
        for _ in range(4)])

    max_seq = ((ctx_bytes + len(PASSKEY_QUESTION) + 256) // 256 + 1) * 256 + 256
    grid = [("dense", 0.0)] + [(m, s) for m in modes for s in sparsities]
    results = {}
    ref_logits = None
    qcache = {}
    for mode, s in grid:
        # a "+w8"/"+w4" suffix runs the variant with weight-only int8/int4
        # params (models/quant.py) — isolates weight-quant accuracy on top
        # of the KV-pruning grid.
        run_params, wtag = params, ""
        for tag in ("+w8a8", "+w8", "+w4"):
            if mode.endswith(tag):
                if tag not in qcache:
                    from mustafar_tpu.models import quant
                    qcache[tag] = {
                        "+w8": quant.quantize_params,
                        "+w4": quant.quantize_params_w4,
                        "+w8a8": lambda p: quant.enable_act_quant(
                            quant.quantize_params(p)),
                    }[tag](params)
                run_params, mode, wtag = qcache[tag], mode[: -len(tag)], tag
                break
        name = ("dense" if mode == "dense" else f"{mode}@{s}") + wtag
        if name in results:   # e.g. dense+w8 is sparsity-independent
            continue
        eng = _engine(cfg, mode, s, max_seq)
        gen = Generator(eng, run_params, dtype=jnp.float32)
        pc = PredictConfig(model_name=cfg.name, max_length=max_seq - 64,
                           out_dir=os.path.join(out_dir, name))
        preds = predict_dataset(gen, tok, "passkey", rows, pc,
                                eos_id=EOS_ID, progress=False)
        acc = scorer("passkey", [p["pred"] for p in preds],
                     [p["answers"] for p in preds], None)
        nll, logits = score_nll(eng, run_params, nll_toks)
        ent = {"passkey_acc": acc, "nll": round(nll, 4),
               "ppl_bits": round(nll / np.log(2), 4)}
        if row_depths is not None:
            per = {}
            for d, p in zip(row_depths, preds):
                per.setdefault(d, []).append(
                    passkey_score(p["pred"], p["answers"][0]))
            ent["acc_by_depth"] = {f"{d:.2f}": round(100 * np.mean(v), 1)
                                   for d, v in sorted(per.items())}
        if mode == "dense":
            ref_logits = logits
        else:
            ent["kl_vs_dense"] = round(kl_vs(ref_logits, logits), 5)
        results[name] = ent
        log(f"{name}: {ent}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def passkey_score(prediction: str, ground_truth: str, **kwargs) -> float:
    """Digit exact-match: first digit run in the prediction vs the key."""
    m = re.search(r"\d+", prediction)
    return float(bool(m) and m.group(0) == ground_truth)
