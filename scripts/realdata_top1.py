#!/usr/bin/env python
"""Real-data train-to-accuracy comparison: reference torch vs this framework.

The parity ladder so far pins logits (test_torch_parity), optimizer steps
(test_optimizer_step_parity), production-lr loss bands
(benchmarks/convergence_band.json) — all on synthetic tensors.  This
experiment crosses the last rung below the (unprovable-here) full-ImageNet
gate: train a ViT on a LABELED REAL-JPEG corpus through each framework's
full data pipeline (JPEG decode → RandomResizedCrop → flip → normalize) and
compare HELD-OUT TOP-1 trajectories (reference claim being matched:
README.md:16-38, training loop train.py:335-386).

Recipe (identical in both arms): ViT depth-9/dim-192 @ 64px (ViT-S scaled to
what a 1-core torch arm can train in ~25 min), n_class=10, AdamW with the
conf's cycle schedule (base_lr 2.5e-4 · B/256, 1 warmup epoch), wd 0.05 with
the vit skip-list, grad clip 5, label smoothing 0.1,
RandomResizedCrop(64, scale 0.08-1, the reference factory.py:170 default) +
hflip; no mixup/randaug/EMA (their parity is pinned separately — PIL-exact
augment tests + mix distribution tests), so any trajectory gap isolates the
train loop + data path, not augmentation RNG.

Subcommands:
  corpus  — generate the 10-class JPEG corpus (parametric textures with
            heavy intra-class variation) + pack .rec records for our loader
  torch   — the reference arm: /root/reference models/vit.py + torch AdamW
            on CPU, PIL data path                       [--seed N]
  ours    — this framework's arm through the REAL ``train.py`` CLI
            (records backend, C++ decode, ``finetune=`` init)  [--seed N]
  report  — merge the arms' JSONL into benchmarks/realdata_top1.json

Both arms start from the SAME torch-initialized weights per seed (the `ours`
arm loads them through ``finetune=init_sN.pt`` — the production converter
path, trainer.py:303-318).
"""

import argparse
import json
import math
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

DATA = os.environ.get("VTX_REALDATA", "/tmp/vtx_realdata")
N_CLASS = 10
IMG_STORE = 96           # stored JPEG size (crop headroom)
IMG = 64                 # train/eval resolution
BATCH = 64
EPOCHS = 16
TRAIN_PER_CLASS = 1200
VAL_PER_CLASS = 150
BASE_LR = 2.5e-4         # the conf value; actual lr = BASE_LR * BATCH / 256
LR = BASE_LR * BATCH / 256
WD = 0.05
CLIP = 5.0
SMOOTH = 0.1
ARCH = dict(image_size=IMG, window_size=16, depth=9, dim=192, n_head=3,
            dim_ff=768)


# ---------------------------------------------------------------------------
# corpus: 10 parametric texture classes with strong intra-class variation
# ---------------------------------------------------------------------------


def _gen_image(cls, rng, size=IMG_STORE):
    import numpy as np

    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    yy = yy / size - 0.5
    xx = xx / size - 0.5
    # class identity: grating orientation (18° apart) + hue bias
    theta = cls * math.pi / N_CLASS + rng.normal(0, 0.06)
    freq = rng.uniform(4.0, 11.0)
    phase = rng.uniform(0, 2 * math.pi)
    u = xx * math.cos(theta) + yy * math.sin(theta)
    grating = np.sin(2 * math.pi * freq * u + phase)
    # distractors shared across classes: blobs + a second random grating
    img = 0.55 * grating
    theta2 = rng.uniform(0, math.pi)
    u2 = xx * math.cos(theta2) + yy * math.sin(theta2)
    img = img + 0.25 * np.sin(2 * math.pi * rng.uniform(3, 9) * u2
                              + rng.uniform(0, 6.28))
    for _ in range(rng.integers(2, 5)):
        cy, cx = rng.uniform(-0.4, 0.4, 2)
        r = rng.uniform(0.05, 0.18)
        img += rng.uniform(-0.8, 0.8) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
    img = img + rng.normal(0, 0.35, img.shape)  # heavy noise
    img = (img - img.min()) / (np.ptp(img) + 1e-6)
    # class hue: rotate channel weights
    hue = cls / N_CLASS + rng.normal(0, 0.05)
    w = np.stack([0.5 + 0.5 * math.cos(2 * math.pi * (hue + s / 3))
                  for s in range(3)])
    base = rng.uniform(0.15, 0.45, 3)
    rgbw = base[:, None, None] + (0.95 - base)[:, None, None] * w[:, None, None]
    rgb = img[None] * rgbw + rng.normal(0, 0.04, (3, size, size))
    return (np.clip(rgb, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)


def cmd_corpus(args):
    import numpy as np
    from PIL import Image

    for split, per_class in (("train", TRAIN_PER_CLASS),
                             ("valid", VAL_PER_CLASS)):
        for cls in range(N_CLASS):
            d = os.path.join(DATA, split, f"class{cls:02d}")
            os.makedirs(d, exist_ok=True)
            rng = np.random.default_rng(
                10_000 * (1 if split == "train" else 2) + cls)
            for i in range(per_class):
                Image.fromarray(_gen_image(cls, rng)).save(
                    os.path.join(d, f"{i:05d}.jpg"), quality=90)
        # pack records for our loader (the same path preprocess.py uses)
        from vision_transformers_tpu.data.records import pack_image_folder
        pack_image_folder(os.path.join(DATA, split),
                          os.path.join(DATA, split))
        print(f"{split}: {N_CLASS * per_class} JPEGs + records", flush=True)


# ---------------------------------------------------------------------------
# shared: file lists, schedule, eval geometry
# ---------------------------------------------------------------------------


def _files(split):
    out = []
    for cls in range(N_CLASS):
        d = os.path.join(DATA, split, f"class{cls:02d}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".jpg"):
                out.append((os.path.join(d, f), cls))
    return out


def _steps_per_epoch():
    return (N_CLASS * TRAIN_PER_CLASS) // BATCH


def _training_conf_dict():
    """The `training` block BOTH arms run — the `ours` arm consumes it as a
    conf file, the torch arm mirrors it field-for-field (schedule parity is
    pinned independently in tests/test_schedule.py)."""
    return {
        "optimizer": {"type": "adamw", "lr": LR},
        "scheduler": {"type": "cycle", "lr": LR, "warmup": 1,
                      "initial_multiplier": 4e-2, "final_multiplier": 1e-5},
        "base_lr": BASE_LR, "weight_decay": WD, "wd_skip": "vit",
        "epoch": EPOCHS, "train_size": IMG, "valid_size": IMG,
        "clip_grad_norm": CLIP,
        "dataloader": {"batch_size": BATCH, "num_workers": 2},
    }


def _lr_table():
    """Per-step lr from OUR schedule factory fed the same Training the conf
    file produces (make_schedule applies the base_lr·B/256 scaling and the
    warmup-in-epochs convention — schedule.py:191-206)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from vision_transformers_tpu.config.schema import Training
    from vision_transformers_tpu.train.schedule import make_schedule

    tr = Training(**_training_conf_dict())
    spe = _steps_per_epoch()
    sched = make_schedule(tr, spe)
    return [float(sched(i)) for i in range(spe * EPOCHS)]


def _eval_pil(path):
    """Resize(shorter side = IMG+32) + CenterCrop(IMG) — the eval geometry
    both frameworks implement (reference factory.py:217-224)."""
    from PIL import Image

    return _eval_pil_img(Image.open(path).convert("RGB"))


MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# torch arm
# ---------------------------------------------------------------------------


def _torch_model(seed):
    import torch

    import test_torch_parity  # installs the tensorfn stub, adds REF to path
    from models.vit import VisionTransformer as TorchViT

    torch.manual_seed(seed)
    return TorchViT(head=torch.nn.Linear(ARCH["dim"], N_CLASS), **ARCH,
                    dropout=0, drop_attn=0, drop_ff=0, drop_path=0)


def _init_path(seed):
    os.makedirs(os.path.join(DATA, "out"), exist_ok=True)
    path = os.path.join(DATA, "out", f"init_s{seed}.pt")
    if not os.path.exists(path):
        import torch

        torch.save(_torch_model(seed).state_dict(), path)
    return path


def _rrc_pil(img, rng):
    """torchvision RandomResizedCrop(IMG) semantics — scale (0.08, 1), ratio
    (3/4, 4/3), the reference factory.py:170 default."""
    import numpy as np
    from PIL import Image

    w, h = img.size
    area = w * h
    for _ in range(10):
        target = rng.uniform(0.08, 1.0) * area
        ar = math.exp(rng.uniform(math.log(3 / 4), math.log(4 / 3)))
        cw = int(round(math.sqrt(target * ar)))
        ch = int(round(math.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.integers(0, w - cw + 1)
            top = rng.integers(0, h - ch + 1)
            crop = img.resize((IMG, IMG), Image.BICUBIC,
                              (left, top, left + cw, top + ch))
            return np.asarray(crop, np.uint8)
    return _eval_pil_img(img)


def _eval_pil_img(img):
    import numpy as np
    from PIL import Image

    short = IMG + 32
    w, h = img.size
    if w < h:
        size = (short, int(round(h * short / w)))
    else:
        size = (int(round(w * short / h)), short)
    img = img.resize(size, Image.BICUBIC)
    left = (size[0] - IMG) // 2
    top = (size[1] - IMG) // 2
    return np.asarray(img.crop((left, top, left + IMG, top + IMG)), np.uint8)


def cmd_torch(args):
    import numpy as np
    import torch
    from PIL import Image

    torch.set_num_threads(max(1, os.cpu_count()))
    model = _torch_model(args.seed)
    model.load_state_dict(torch.load(_init_path(args.seed)))

    train = _files("train")
    val = _files("valid")
    spe = _steps_per_epoch()
    lrs = _lr_table()

    # wd skip-list: no decay on bias/LN/cls/pos (reference train.py:94-100,
    # matched by our wd_skip="vit")
    decay, no_decay = [], []
    for n, p in model.named_parameters():
        if p.ndim <= 1 or n in ("cls_token", "pos_embed"):
            no_decay.append(p)
        else:
            decay.append(p)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}], lr=LR)
    lsm = torch.nn.CrossEntropyLoss(label_smoothing=SMOOTH)
    ce = torch.nn.CrossEntropyLoss()  # valid loss: unsmoothed (train.py:343)

    mean = torch.tensor(MEAN).view(1, 3, 1, 1)
    std = torch.tensor(STD).view(1, 3, 1, 1)

    def to_batch(imgs):
        x = torch.from_numpy(np.stack(imgs)).float().permute(0, 3, 1, 2) / 255
        return (x - mean) / std

    val_imgs = to_batch([_eval_pil(p) for p, _ in val])
    val_lbl = torch.tensor([c for _, c in val])

    def evaluate():
        model.eval()
        correct, loss_sum = 0, 0.0
        with torch.no_grad():
            for i in range(0, len(val), 128):
                logits = model(val_imgs[i:i + 128])
                y = val_lbl[i:i + 128]
                correct += (logits.argmax(-1) == y).sum()
                loss_sum += float(ce(logits, y)) * len(y)
        model.train()
        return float(correct) / len(val), loss_sum / len(val)

    rng = np.random.default_rng(1000 + args.seed)
    out_path = os.path.join(DATA, "out", f"torch_s{args.seed}.jsonl")
    step = 0
    with open(out_path, "w") as f:
        for epoch in range(EPOCHS):
            order = rng.permutation(len(train))
            for b in range(spe):
                idx = order[b * BATCH:(b + 1) * BATCH]
                imgs, lbls = [], []
                for i in idx:
                    path, cls = train[i]
                    img = Image.open(path).convert("RGB")
                    imgs.append(_rrc_pil(img, rng))
                    if rng.random() < 0.5:
                        imgs[-1] = imgs[-1][:, ::-1]
                    lbls.append(cls)
                x = to_batch(imgs)
                y = torch.tensor(lbls)
                for g in opt.param_groups:
                    g["lr"] = lrs[step]
                loss = lsm(model(x), y)
                opt.zero_grad()
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
                opt.step()
                step += 1
            acc, vloss = evaluate()
            rec = {"arm": "torch", "seed": args.seed, "epoch": epoch + 1,
                   "step": step, "valid_loss": round(vloss, 4),
                   "top1": round(acc, 4)}
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)


# ---------------------------------------------------------------------------
# ours arm — the REAL train.py CLI on the records corpus
# ---------------------------------------------------------------------------


CONF_TEMPLATE = """\
# generated by scripts/realdata_top1.py — ViT @64px on the 10-class corpus
arch: {{
    type: vit
    image_size: {img}
    window_size: {window}
    n_class: {n_class}
    depth: {depth}
    dim: {dim}
    n_head: {n_head}
    dim_ff: {dim_ff}
    dropout: 0
    drop_path: 0
}}

training: {{
    optimizer: {{ type: adamw, lr: {lr} }}
    scheduler: {{
        type: cycle
        lr: {lr}
        warmup: 1
        initial_multiplier: 4e-2
        final_multiplier: 1e-5
    }}
    base_lr: {base_lr}
    weight_decay: {wd}
    wd_skip: vit
    epoch: {epochs}

    train_size: {img}
    valid_size: {img}

    randaug_layer: 0
    erasing: 0
    mixup: 0
    cutmix: 0

    clip_grad_norm: {clip}
    grad_accumulation: 1

    dataloader: {{
        batch_size: {batch}
        num_workers: 2
    }}
}}

dataset_path: {data}
log_freq: 50

checker: {{
    storage: [
        {{ type: local, path: {data}/out/ckpt_s{seed} }}
    ]
    reporter: [
        {{ type: logger }}
        {{ type: jsonl, path: {metrics} }}
    ]
}}
"""


def cmd_ours(args):
    init = _init_path(args.seed)
    metrics = os.path.join(DATA, "out", f"ours_metrics_s{args.seed}.jsonl")
    resume = os.path.isdir(os.path.join(DATA, "out", f"ckpt_s{args.seed}"))
    if os.path.exists(metrics) and not resume:
        os.unlink(metrics)
    conf_path = os.path.join(DATA, "out", f"realdata_s{args.seed}.conf")
    with open(conf_path, "w") as f:
        f.write(CONF_TEMPLATE.format(
            img=IMG, window=ARCH["window_size"], n_class=N_CLASS,
            depth=ARCH["depth"], dim=ARCH["dim"], n_head=ARCH["n_head"],
            dim_ff=ARCH["dim_ff"], lr=LR, base_lr=BASE_LR, wd=WD,
            epochs=EPOCHS, clip=CLIP, batch=BATCH, data=DATA,
            seed=args.seed, metrics=metrics))

    cmd = [sys.executable, os.path.join(ROOT, "train.py"),
           "--conf", conf_path, f"finetune={init}", f"seed={args.seed}",
           f"precision={args.precision}"]
    if resume:
        cmd.append("resume=auto")  # continue an interrupted arm run
    print("$", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)

    # re-shape the trainer's per-epoch valid metrics into the report rows
    spe = _steps_per_epoch()
    out_path = os.path.join(
        DATA, "out", f"ours_{args.precision}_s{args.seed}.jsonl")
    by_epoch = {}
    with open(metrics) as f:
        for line in f:
            r = json.loads(line)
            if "prec1" not in r:
                continue
            # the trainer logs the 0-based completed-epoch index
            epoch = int(r.get("epoch", r.get("step", 0))) + 1
            by_epoch[epoch] = {  # last write wins (resumed runs re-log)
                "arm": f"ours_{args.precision}", "seed": args.seed,
                "epoch": epoch, "step": epoch * spe,
                "valid_loss": round(float(r["loss"]), 4),
                "top1": round(float(r["prec1"]) / 100.0, 4)}
    with open(out_path, "w") as out:
        for epoch in sorted(by_epoch):
            out.write(json.dumps(by_epoch[epoch]) + "\n")
            print(by_epoch[epoch], flush=True)


def cmd_report(args):
    import glob

    rows = []
    for path in sorted(glob.glob(os.path.join(DATA, "out", "*.jsonl"))):
        if os.path.basename(path).startswith("ours_metrics"):
            continue
        with open(path) as f:
            rows.extend(json.loads(l) for l in f if l.strip())
    by = {}
    for r in rows:
        by.setdefault((r["arm"], r["epoch"]), []).append(r["top1"])
    table = {}
    arms = sorted({r["arm"] for r in rows})
    for epoch in sorted({r["epoch"] for r in rows}):
        table[epoch] = {a: by.get((a, epoch)) for a in arms}
    # criterion: over the last 4 epochs, |mean top1 gap| must be within the
    # larger of 2·(cross-seed std) and 1 pt — the same shape as the
    # convergence-band gate, stated on accuracy instead of loss
    import numpy as np

    last = sorted(table)[-4:]
    crit = None
    ours_arms = [a for a in arms if a.startswith("ours")]
    if "torch" in arms and ours_arms:
        gaps, spreads = [], []
        for e in last:
            t = table[e].get("torch")
            o = table[e].get(ours_arms[0])
            if t and o:
                gaps.append(abs(float(np.mean(o)) - float(np.mean(t))))
                spreads.append(float(np.std(t)) if len(t) > 1 else 0.0)
        if gaps:
            crit = {"last_epochs": last,
                    "mean_abs_gap": round(float(np.mean(gaps)), 4),
                    "max_abs_gap": round(float(np.max(gaps)), 4),
                    "torch_seed_std": round(float(np.mean(spreads)), 4),
                    "threshold": round(max(2 * float(np.mean(spreads)),
                                           0.01), 4)}
            crit["pass"] = crit["max_abs_gap"] <= crit["threshold"]
    out = {"recipe": {"arch": ARCH, "batch": BATCH, "epochs": EPOCHS,
                      "lr": LR, "wd": WD, "clip": CLIP, "smooth": SMOOTH,
                      "corpus": f"{N_CLASS}x{TRAIN_PER_CLASS} train / "
                                f"{N_CLASS}x{VAL_PER_CLASS} val JPEG q90 "
                                f"@{IMG_STORE}px"},
           "criterion": crit, "rows": rows, "top1_by_epoch": table}
    dest = os.path.join(ROOT, "benchmarks", "realdata_top1.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    for epoch, accs in table.items():
        print(epoch, accs)
    print("criterion:", crit)
    print("→", dest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["corpus", "torch", "ours", "report"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    {"corpus": cmd_corpus, "torch": cmd_torch, "ours": cmd_ours,
     "report": cmd_report}[args.cmd](args)


if __name__ == "__main__":
    main()
