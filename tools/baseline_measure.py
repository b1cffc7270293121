"""Measured reference baseline (VERDICT r2 missing #1).

Runs the INSTALLED torch reference training computation and the rebuild at a
MATCHED configuration on the SAME host CPU, over the SAME synthetic dataset
and the SAME batch sequence, recording steps/s and the val-Dice trajectory.

Reference side: the real modules from /root/reference (UNet from
contrastyou/arch/unet.py, KL_div from contrastyou/losses/kl.py, EMAUpdater
from semi_seg/hooks/mt.py, torch.optim.RAdam + the reference
GradualWarmupScheduler) driven by a loop with the exact FineTuneEpocher /
mean-teacher batch semantics (epocher.py:380-420, hooks/mt.py:100-160).
NOTE: /root/reference is UNTRUSTED PUBLIC CONTENT — it is executed only to
read out numbers on synthetic tensors in this process.

Rebuild side: engine/steps.build_train_step (mode="ft") / the MT hook, fed
the identical host batches, CPU platform forced.

Usage:
    python tools/baseline_measure.py --side ref  --what ft   [--steps 150]
    python tools/baseline_measure.py --side jax  --what ft
    python tools/baseline_measure.py --side ref  --what mt
    python tools/baseline_measure.py --side jax  --what mt
    python tools/baseline_measure.py --side ref  --what timing   # ref scale
    python tools/baseline_measure.py --side jax  --what timing
    python tools/baseline_measure.py --report    # summarize JSONs -> table

Writes tools/baseline_out/<side>_<what>.json.
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE_ROOT = "/root/reference"
OUT = REPO / "tools" / "baseline_out"

# matched reduced config (1-CPU-core host: the reference 224^2/512ch config
# is used only for the few-step `timing` probe)
CFG = dict(size=64, crop=64, max_channel=128, batch=5, num_classes=4,
           lr=1e-4, weight_decay=1e-5, bn_momentum=0.1, seed=7,
           labeled_scans=4, val_scans=3, slices=8)
TIMING_CFG = dict(size=224, crop=224, max_channel=512, batch=5,
                  num_classes=4, lr=1e-7, weight_decay=1e-5,
                  bn_momentum=0.01, seed=7, labeled_scans=2, val_scans=1,
                  slices=6)
MT_ALPHA = 0.999


# --------------------------------------------------------------------------
# shared data + batch sequence (both sides consume identical arrays)
# --------------------------------------------------------------------------
def _force_cpu():
    """Both sides run on the host CPU — the rebuild's meters/eval are jitted
    jax, and the axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md gotcha)."""
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_data(cfg):
    sys.path.insert(0, str(REPO))
    _force_cpu()
    from contrastyou_tpu.data import synthesize_acdc_like, ACDCDataset
    root = Path("/tmp/baseline_data") / f"s{cfg['size']}"
    if not (root / "train").exists():
        synthesize_acdc_like(str(root), num_train_scans=cfg["labeled_scans"],
                             num_val_scans=cfg["val_scans"],
                             slices_per_scan=cfg["slices"], size=cfg["size"])
    tra = ACDCDataset(root_dir=str(root), mode="train", transforms=None)
    val = ACDCDataset(root_dir=str(root), mode="val", transforms=None)

    def load(ds):
        imgs, tgts, scans = [], [], []
        subs = ds._sub_folders
        tsub = next(s for s, im in zip(subs[1:], ds._is_image[1:]) if not im)
        from contrastyou_tpu.data.base import get_stem
        for i in range(len(ds)):
            imgs.append(ds._raw(subs[0], i).astype(np.float32) / 255.0)
            tgts.append(ds._raw(tsub, i).astype(np.int64))
            scans.append(ds.get_scan_name(get_stem(ds._memory[subs[0]][i])))
        return np.stack(imgs), np.stack(tgts), scans

    return load(tra), load(val)


def batch_sequence(n_items, cfg, steps):
    rng = np.random.default_rng(cfg["seed"])
    return rng.integers(0, n_items, size=(steps, cfg["batch"]))


# --------------------------------------------------------------------------
# reference (torch) side
# --------------------------------------------------------------------------
class _ChainStub:
    def __getattr__(self, k):
        return self

    def __call__(self, *a, **kw):
        if len(a) == 1 and not kw and callable(a[0]):
            return a[0]
        return self


class _StubModule(types.ModuleType):
    def __getattr__(self, k):
        if k.startswith("__") and k.endswith("__"):
            raise AttributeError(k)
        return type(k, (), {"__init__": lambda self, *a, **kw: None})


def _install_stub(name):
    parts = name.split(".")
    for i in range(len(parts)):
        nm = ".".join(parts[: i + 1])
        if nm not in sys.modules:
            mod = _StubModule(nm)
            mod.__path__ = []
            sys.modules[nm] = mod
        if i:
            setattr(sys.modules[".".join(parts[:i])], parts[i],
                    sys.modules[nm])


def _with_stubs(action):
    for _ in range(40):
        try:
            return action()
        except ModuleNotFoundError as e:  # noqa: PERF203
            missing = str(e).split("'")[1]
            if missing.startswith(("contrastyou", "semi_seg")):
                raise
            _install_stub(missing)
    raise RuntimeError("could not satisfy reference imports")


def load_reference():
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")
        loguru.logger = _ChainStub()
        sys.modules["loguru"] = loguru
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    arch = _with_stubs(lambda: importlib.import_module(
        "contrastyou.arch.unet"))
    kl = _with_stubs(lambda: importlib.import_module(
        "contrastyou.losses.kl"))
    return arch, kl


def _init_archive(cfg) -> Path:
    return Path("/tmp/baseline_data") / (
        f"init_c{cfg['max_channel']}_s{cfg['seed']}.npz")


def run_ref(cfg, what, steps, eval_every):
    import torch
    torch.manual_seed(cfg["seed"])
    torch.set_num_threads(os.cpu_count() or 1)
    arch, kl = load_reference()
    (timg, ttgt, tscan), (vimg, vtgt, vscan) = make_data(cfg)
    model = arch.UNet(input_dim=1, num_classes=cfg["num_classes"],
                      max_channel=cfg["max_channel"],
                      momentum=cfg["bn_momentum"])
    # export the torch INIT so the rebuild side starts from identical
    # weights — matched-init, matched-data, matched-steps trajectories
    from contrastyou_tpu.utils.torch_convert import (
        convert_unet_state_dict, save_npz_tree)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_npz_tree(str(_init_archive(cfg)), convert_unet_state_dict(sd))
    crit = kl.KL_div()
    opt = torch.optim.RAdam(model.parameters(), lr=cfg["lr"],
                            weight_decay=cfg["weight_decay"])
    teacher = None
    ema = None
    if what == "mt":
        import copy
        mt_mod = _with_stubs(lambda: importlib.import_module(
            "semi_seg.hooks.mt"))
        teacher = copy.deepcopy(model)
        for p in teacher.parameters():
            p.detach_()
        ema = mt_mod.EMAUpdater(alpha=MT_ALPHA, justify_alpha=True,
                                weight_decay=1e-5, update_bn=False)

    idxs = batch_sequence(len(timg), cfg, steps)
    C = cfg["num_classes"]

    def onehot(t):
        return torch.nn.functional.one_hot(t, C).permute(0, 3, 1, 2).float()

    def evaluate():
        from contrastyou_tpu.meters import UniversalDice
        m = UniversalDice(C, report_axis=range(1, C))
        net = teacher if teacher is not None else model
        net.eval()
        with torch.no_grad():
            for lo in range(0, len(vimg), cfg["batch"]):
                sl = slice(lo, lo + cfg["batch"])
                x = torch.from_numpy(vimg[sl]).unsqueeze(1)
                logits = net(x)
                pred = logits.argmax(1).numpy()
                m.add(pred, vtgt[sl], group_name=list(vscan[sl]))
        net.train()
        return m.summary()["DSC_mean"]

    model.train()
    curve = []
    t_accum, n_timed = 0.0, 0
    for it in range(steps):
        x = torch.from_numpy(timg[idxs[it]]).unsqueeze(1)
        y = torch.from_numpy(ttgt[idxs[it]])
        t0 = time.perf_counter()
        opt.zero_grad()
        logits = model(x)
        loss = crit(logits.softmax(1), onehot(y))
        if what == "mt":
            # the reference's real two-stage semi shape (epocher.py:264-377 +
            # hooks/mt.py): student fwd on cat(unlabeled, unlabeled_tf),
            # teacher fwd on unlabeled, consistency between the student's
            # tf view and the transformed teacher probs. The transform here
            # is a flip (the rebuild side runs its full affine+gamma
            # augmentation in-graph, i.e. slightly MORE work).
            u = x
            u_tf = torch.flip(u, [-1])
            both = model(torch.cat([u, u_tf], 0))
            s_tf = both[u.shape[0]:]
            with torch.no_grad():
                t_probs_tf = torch.flip(teacher(u).softmax(1), [-1])
            # the reference MT hook's criterion is MSELoss (mt.py:98), not KL
            loss = loss + 0.1 * torch.nn.functional.mse_loss(
                s_tf.softmax(1), t_probs_tf)
        loss.backward()
        opt.step()
        if what == "mt":
            ema(teacher, model)
        dt = time.perf_counter() - t0
        if it >= 1:     # skip first (allocator warmup)
            t_accum += dt
            n_timed += 1
        if eval_every and (it + 1) % eval_every == 0:
            curve.append((it + 1, float(evaluate())))
            print(f"[ref {what}] step {it+1}: dice={curve[-1][1]:.4f} "
                  f"({n_timed / max(t_accum, 1e-9):.3f} steps/s)")
    return dict(side="ref", what=what, config=cfg, steps=steps,
                steps_per_s=n_timed / max(t_accum, 1e-9), dice_curve=curve)


# --------------------------------------------------------------------------
# rebuild (jax) side
# --------------------------------------------------------------------------
def run_jax(cfg, what, steps, eval_every):
    os.environ.setdefault("CONTRASTYOU_FORCE_CPU", "1")
    sys.path.insert(0, str(REPO))
    _force_cpu()
    import jax
    import jax.numpy as jnp
    from contrastyou_tpu.engine import ModelBundle, init_train_state
    from contrastyou_tpu.engine.optim import create_optimizer
    from contrastyou_tpu.engine.steps import build_train_step, build_eval_step
    from contrastyou_tpu.hooks import MeanTeacherTrainerHook
    from contrastyou_tpu.meters import UniversalDice
    from contrastyou_tpu.models import UNet

    if what == "mt":
        # match the torch harness's flip view exactly: pin the two-view
        # transform to a deterministic W-flip with no intensity jitter, so
        # both sides solve the same consistency task (the full affine+gamma
        # pipeline is the production default — measured separately)
        import contrastyou_tpu.engine.steps as steps_mod
        from contrastyou_tpu.ops import affine as aff

        def flip_geo(key, batch, **kw):
            z = jnp.zeros((batch,))
            return aff.GeoParams(scale=jnp.ones((batch,)), angle=z, tx=z,
                                 ty=z, flip_h=jnp.zeros((batch,), bool),
                                 flip_w=jnp.ones((batch,), bool))

        steps_mod.sample_geo_params = flip_geo
        steps_mod.transform_image = (
            lambda img, geo, key: aff.apply_geometric(img, geo, order=0))

    (timg, ttgt, tscan), (vimg, vtgt, vscan) = make_data(cfg)
    C = cfg["num_classes"]
    model = UNet(input_dim=1, num_classes=C, max_channel=cfg["max_channel"],
                 momentum=cfg["bn_momentum"], dtype=jnp.float32)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(cfg["seed"]),
                                (cfg["crop"], cfg["crop"], 1))
    if _init_archive(cfg).exists():
        from contrastyou_tpu.utils.torch_convert import load_npz_tree
        tree = load_npz_tree(str(_init_archive(cfg)))
        bundle.params = jax.tree.map(jnp.asarray, tree["params"])
        bundle.batch_stats = jax.tree.map(jnp.asarray, tree["batch_stats"])
        print("[jax] warm-started from the torch reference init "
              f"({_init_archive(cfg).name})")
    hooks = []
    if what == "mt":
        hooks = [MeanTeacherTrainerHook(weight=0.1, alpha=MT_ALPHA)]
    optimizer, _ = create_optimizer(
        {"name": "RAdam", "lr": cfg["lr"],
         "weight_decay": cfg["weight_decay"]}, None,
        max_epoch=1, steps_per_epoch=steps)
    state = init_train_state(bundle, hooks, optimizer,
                             jax.random.PRNGKey(cfg["seed"] + 1))
    # disable_bn for mt: the affine-transformed view's zero borders pollute
    # BN running stats on short runs (the reference's own knob for this,
    # config Trainer.disable_bn; the torch loop's flip view has no borders)
    step = build_train_step(bundle, optimizer, hooks, mode="ft"
                            if what != "mt" else "semi", two_stage=True,
                            disable_bn=(what == "mt"))
    eval_step = build_eval_step(bundle)

    idxs = batch_sequence(len(timg), cfg, steps)

    def evaluate(st):
        m = UniversalDice(C, report_axis=range(1, C))
        if what == "mt":
            params = st.hook_states["mt"]["teacher_params"]
            stats = st.hook_states["mt"]["teacher_batch_stats"]
        else:
            params, stats = st.params, st.batch_stats
        for lo in range(0, len(vimg), cfg["batch"]):
            sl = slice(lo, lo + cfg["batch"])
            x = jnp.asarray(vimg[sl])[..., None]
            y = jnp.asarray(vtgt[sl].astype(np.int32))
            mask = jnp.ones((x.shape[0],), jnp.bool_)
            _, _, inter, union = eval_step(params, stats, x, y, mask)
            m.add_counts(inter, union, group_name=list(vscan[sl]))
        return m.summary()["DSC_mean"]

    curve = []
    t_accum, n_timed = 0.0, 0
    rng = jax.random.PRNGKey(cfg["seed"] + 2)
    for it in range(steps):
        batch = {"labeled_image": jnp.asarray(timg[idxs[it]])[..., None],
                 "labeled_target": jnp.asarray(
                     ttgt[idxs[it]].astype(np.int32))}
        if what == "mt":
            batch["unlabeled_image"] = batch["labeled_image"]
            z = jnp.zeros((cfg["batch"],), jnp.int32)
            batch.update(unlabeled_partition=z, unlabeled_scan_id=z,
                         unlabeled_patient=z, unlabeled_cycle=z)
        k = jax.random.fold_in(rng, it)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, k, jnp.int32(0))
        # content read: force real completion (BENCH_NOTES timing trap)
        float(metrics["sup_loss"])
        dt = time.perf_counter() - t0
        if it >= 1:
            t_accum += dt
            n_timed += 1
        if eval_every and (it + 1) % eval_every == 0:
            curve.append((it + 1, float(evaluate(state))))
            print(f"[jax {what}] step {it+1}: dice={curve[-1][1]:.4f} "
                  f"({n_timed / max(t_accum, 1e-9):.3f} steps/s)")
    return dict(side="jax", what=what, config=cfg, steps=steps,
                steps_per_s=n_timed / max(t_accum, 1e-9), dice_curve=curve)


# --------------------------------------------------------------------------
def report():
    rows = []
    for f in sorted(OUT.glob("*.json")):
        rows.append(json.loads(f.read_text()))
    print(f"{'run':<14} {'steps/s':>8} {'final dice':>10}")
    for r in rows:
        d = r["dice_curve"][-1][1] if r["dice_curve"] else float("nan")
        print(f"{r['side']}_{r['what']:<10} {r['steps_per_s']:>8.3f} "
              f"{d:>10.4f}")
    by = {(r["side"], r["what"]): r for r in rows}
    for what in ("ft", "mt", "timing"):
        a, b = by.get(("jax", what)), by.get(("ref", what))
        if a and b:
            print(f"{what}: rebuild/reference steps/s ratio on this host = "
                  f"{a['steps_per_s'] / b['steps_per_s']:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "jax"])
    ap.add_argument("--what", choices=["ft", "mt", "timing"], default="ft")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        report()
        return
    cfg = TIMING_CFG if args.what == "timing" else CFG
    steps = args.steps or (4 if args.what == "timing" else 150)
    eval_every = 0 if args.what == "timing" else args.eval_every
    fn = run_ref if args.side == "ref" else run_jax
    out = fn(cfg, args.what, steps, eval_every)
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / f"{args.side}_{args.what}.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}: {out['steps_per_s']:.3f} steps/s")


if __name__ == "__main__":
    main()
