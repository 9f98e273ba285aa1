"""Few-shot inference CLI — the serving entry point.

    python -m audio_few_shot_learning_tpu.cli.predict \
        -e experiment_config.json -m model_config.json \
        --checkpoint experiments/<exp>/model_run0.ckpt \
        --support /path/support_set --query clip1.wav clip2.npy ... \
        [--norm-stats <dataset>/norm_stats/glob_norm.npy] [--output out.json]

The reference has NO inference path (train/test only, src/train_test.py);
this classifies arbitrary audio against a user-supplied support set with a
trained checkpoint: prototypes from the support items, nearest-prototype
(or relation/attention head, per the config) scoring for the queries —
the exact eval-time pipeline via Trainer.predict_episode.

Layout: --support is a directory with one subdirectory per class, each
holding that class's examples. Items may be:
  * .npy 2-D [F, T] preprocessed features (offline to_spec layout); pass
    --norm-stats if they are raw (un-normalized) features,
  * .npy 3-D [S, F, T] stacked segments (first segment is used),
  * .npy 1-D or .wav raw audio — for spec-input models it is converted with
    the offline mel flavor (to_spec semantics) and requires --norm-stats;
    wav-input models consume the waveform directly (mel + z-norm on device).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

AUDIO_EXTS = {".wav", ".flac", ".ogg", ".mp3"}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-e", "--experiment_config", required=True)
    p.add_argument("-m", "--model_config", required=True)
    p.add_argument("--checkpoint", required=True, help="model .ckpt (flax msgpack)")
    p.add_argument("--support", required=True,
                   help="directory: one subdir per class with example items")
    p.add_argument("--query", required=True, nargs="+",
                   help="query files, or one directory of them")
    p.add_argument("--norm-stats", default=None,
                   help="glob_norm.npy [2,1,1] (mean,std). Required for raw "
                        "audio into spec models; recommended for wav models")
    p.add_argument("--output", default=None, help="write predictions JSON here")
    p.add_argument("--key", type=int, default=0,
                   help="PRNG seed for support-view augmentation draws")
    return p.parse_args(argv)


def _collect_queries(paths):
    out = []
    for q in paths:
        qp = Path(q)
        if qp.is_dir():
            out += sorted(
                p for p in qp.iterdir()
                if p.suffix.lower() in AUDIO_EXTS | {".npy"}
            )
        else:
            out.append(qp)
    if not out:
        sys.exit("predict: no query items found")
    return out


class _ItemLoader:
    """Loads one support/query item into the model's input space."""

    def __init__(self, is_wav_model: bool, stats, exp):
        self.is_wav = is_wav_model
        self.stats = stats  # (mean, std) or None
        self.exp = exp
        self._mel = None

    def _offline_mel(self, wave):
        import numpy as np

        if self._mel is None:
            from audio_few_shot_learning_tpu.ops.mel import MelSpec

            # offline flavor == preprocessing/to_spec.py semantics (librosa
            # Slaney filterbank), the pipeline that produced training features
            self._mel = MelSpec(flavor="offline")
        if self.stats is None:
            sys.exit("predict: raw audio into a spec model needs --norm-stats "
                     "(the dataset's glob_norm.npy) to match training normalization")
        feat = np.asarray(self._mel(wave), dtype=np.float32)
        return (feat - self.stats[0]) / self.stats[1]

    def __call__(self, path: Path):
        import numpy as np

        from audio_few_shot_learning_tpu.config import SAMPLE_RATE

        if path.suffix.lower() == ".npy":
            x = np.load(path)
            if x.ndim == 3:  # stacked segments: deterministic first segment
                x = x[0]
            if x.ndim == 2:
                if self.is_wav:
                    sys.exit(f"predict: {path} is a 2-D feature but the model "
                             "is wav-input; provide raw audio")
                if self.stats is not None:
                    x = (x - self.stats[0]) / self.stats[1]
                return x.astype(np.float32)
            wave = x.astype(np.float32)  # 1-D raw waveform
        elif path.suffix.lower() in AUDIO_EXTS:
            from audio_few_shot_learning_tpu.preprocessing.audio_io import load_audio

            wave = load_audio(path, sr=SAMPLE_RATE)
        else:
            sys.exit(f"predict: unsupported file type: {path}")
        return wave if self.is_wav else self._offline_mel(wave)


def main(argv=None):
    args = parse_args(argv)

    import numpy as np

    from audio_few_shot_learning_tpu.config import load_configs

    exp, mdl = load_configs(args.experiment_config, args.model_config)
    if exp.device == "cpu":  # honor config device before any backend init
        import jax

        jax.config.update("jax_platforms", "cpu")

    stats = None
    if args.norm_stats:
        g = np.load(args.norm_stats).reshape(-1)
        stats = (float(g[0]), float(g[1]))

    is_wav = exp.input_type == "wav"
    loader = _ItemLoader(is_wav, stats, exp)

    sup_root = Path(args.support)
    class_names = sorted(d.name for d in sup_root.iterdir() if d.is_dir())
    if len(class_names) < 2:
        sys.exit(f"predict: --support needs >=2 class subdirectories, "
                 f"found {class_names}")
    sup_items, sup_labels = [], []
    for li, name in enumerate(class_names):
        files = sorted(
            p for p in (sup_root / name).iterdir()
            if p.suffix.lower() in AUDIO_EXTS | {".npy"}
        )
        if not files:
            sys.exit(f"predict: support class '{name}' has no items")
        for f in files:
            sup_items.append(loader(f))
            sup_labels.append(li)

    query_files = _collect_queries(args.query)
    qry_items = [loader(f) for f in query_files]

    # one input geometry for the whole episode
    def _conform(items, what):
        if is_wav:
            l = max(len(x) for x in sup_items)
            return np.stack([
                np.pad(x[:l], (0, max(0, l - len(x)))) for x in items
            ])
        shape = sup_items[0].shape
        for x, f in zip(items, (["support"] * len(sup_items) if what == "s"
                                else query_files)):
            if x.shape != shape:
                sys.exit(f"predict: {what} item {f} has shape {x.shape}, "
                         f"support geometry is {shape}")
        return np.stack(items)

    support = _conform(sup_items, "s")
    query = _conform(qry_items, "q")

    # a Trainer needs a store: build one from the support set (items are
    # already in model input space, so no further normalization here)
    from audio_few_shot_learning_tpu.train import checkpoint as ckpt
    from audio_few_shot_learning_tpu.train.engine import Trainer

    if is_wav:
        from audio_few_shot_learning_tpu.data.wavstore import PackedWavStore

        store = PackedWavStore.pack(
            list(support), sup_labels, len(class_names),
            mean=stats[0] if stats else 0.0, std=stats[1] if stats else 1.0,
        )
    else:
        from audio_few_shot_learning_tpu.data.store import PackedStore

        store = PackedStore.pack(list(support), sup_labels, len(class_names))

    trainer = Trainer(exp, mdl, store)
    params, bstats = ckpt.load_model(
        args.checkpoint, trainer.state.params, trainer.state.batch_stats
    )
    trainer.state = trainer.state.replace(params=params, batch_stats=bstats)

    import jax

    pred, scores = trainer.predict_episode(
        support, np.asarray(sup_labels), query,
        n_way=len(class_names), key=jax.random.PRNGKey(args.key),
    )

    results = []
    for f, p, s in zip(query_files, pred, scores):
        order = np.argsort(-s)
        results.append({
            "file": str(f),
            "predicted_class": class_names[int(p)],
            "scores": {class_names[i]: round(float(s[i]), 4)
                       for i in order},
        })
    payload = {"n_way": len(class_names), "classes": class_names,
               "checkpoint": args.checkpoint, "predictions": results}
    text = json.dumps(payload, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
