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
# udaiic preset weights (config/hooks/udaiic.yaml == the reference's):
# consistency 1.0 + IIC@Conv5 0.1 + dense IIC@Up_conv2 0.05 (padding 1)
UDAIIC = dict(cons_w=1.0, enc_w=0.1, dense_w=0.05, padding=1, K=20, S=5)
# pretrain->ft chain: encoder InfoNCE@Conv5 (mlp 256/256 projector,
# normalized, SupCon target = partition labels — config/hooks/infonce.yaml
# contrast_ons: partition), then supervised finetune from the result
PRETRAIN = dict(steps=300, weight=1.0, temperature=0.07)
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
        from contrastyou_tpu.data.wire import normalize_u8
        imgs, tgts, scans = [], [], []
        subs = ds._sub_folders
        tsub = next(s for s, im in zip(subs[1:], ds._is_image[1:]) if not im)
        from contrastyou_tpu.data.base import get_stem
        for i in range(len(ds)):
            imgs.append(normalize_u8(ds._raw(subs[0], i)))
            tgts.append(ds._raw(tsub, i).astype(np.int64))
            scans.append(ds.get_scan_name(get_stem(ds._memory[subs[0]][i])))
        # 3-way positional partition per scan (the reference ContrastDataset
        # partition notion, semi_seg/data/dataset.py) — used as the InfoNCE
        # contrast_on=partition label on BOTH sides
        seen: dict = {}
        part = []
        for s in scans:
            seen[s] = seen.get(s, 0) + 1
            part.append(seen[s] - 1)
        per_scan = {s: n for s, n in seen.items()}
        part = np.asarray([p * 3 // per_scan[s]
                           for p, s in zip(part, scans)], np.int64)
        return np.stack(imgs), np.stack(tgts), scans, part

    return load(tra), load(val)


def batch_sequence(n_items, cfg, steps, seed_offset: int = 0):
    rng = np.random.default_rng(cfg["seed"] + seed_offset)
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


def _preload_midl():
    """discreteMI <-> semi_seg.hooks are circular (discreteMI imports
    semi_seg.hooks.midl, hooks/cc.py imports discreteMI back); pre-load
    midl.py standalone under its dotted name to break the cycle (same
    workaround as tests/test_reference_parity.py:98-106)."""
    if "semi_seg.hooks.midl" not in sys.modules:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "semi_seg.hooks.midl", f"{REFERENCE_ROOT}/semi_seg/hooks/midl.py")
        midl = importlib.util.module_from_spec(spec)
        sys.modules["semi_seg.hooks.midl"] = midl
        _with_stubs(lambda: spec.loader.exec_module(midl))


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


def _udaiic_proj_archive(cfg) -> Path:
    return Path("/tmp/baseline_data") / (
        f"proj_udaiic_c{cfg['max_channel']}_s{cfg['seed']}.npz")


def _nce_proj_archive(cfg) -> Path:
    return Path("/tmp/baseline_data") / (
        f"proj_nce_c{cfg['max_channel']}_s{cfg['seed']}.npz")


def _export_udaiic_projectors(cfg, enc_proj, dense_proj, K, S):
    """torch projector inits -> the jax hook param layout.

    ClusterHead linear subhead = Sequential(pool, Flatten, Linear, ...) ->
    jax Vmap_SubHead_0/Dense_0 kernel [S, C, K]; DenseClusterHead linear =
    Sequential(Conv2d(C,K,1), ...) -> Vmap_DenseSubHead_0/Conv_0 kernel
    [S, 1, 1, C, K]."""
    ew = np.stack([enc_proj._headers[i][2].weight.detach().numpy().T
                   for i in range(S)])                        # [S, C, K]
    eb = np.stack([enc_proj._headers[i][2].bias.detach().numpy()
                   for i in range(S)])                        # [S, K]
    dw = np.stack([dense_proj._headers[i][0].weight.detach()
                   .numpy()[:, :, 0, 0].T for i in range(S)])  # [S, C, K]
    db = np.stack([dense_proj._headers[i][0].bias.detach().numpy()
                   for i in range(S)])
    np.savez(_udaiic_proj_archive(cfg), enc_kernel=ew, enc_bias=eb,
             dense_kernel=dw[:, None, None], dense_bias=db)


def _export_nce_projector(cfg, proj):
    """ProjectionHead mlp = Sequential(pool, Flatten, Linear(C,256),
    LeakyReLU, Linear(256,256), Normalize) -> jax Dense_0/Dense_1."""
    np.savez(_nce_proj_archive(cfg),
             k0=proj._header[2].weight.detach().numpy().T,
             b0=proj._header[2].bias.detach().numpy(),
             k1=proj._header[4].weight.detach().numpy().T,
             b1=proj._header[4].bias.detach().numpy())


def run_ref(cfg, what, steps, eval_every):
    import torch
    torch.manual_seed(cfg["seed"])
    torch.set_num_threads(os.cpu_count() or 1)
    arch, kl = load_reference()
    (timg, ttgt, tscan, tpart), (vimg, vtgt, vscan, _) = make_data(cfg)
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
    aux = {}
    if what == "udaiic":
        _preload_midl()
        heads = _with_stubs(lambda: importlib.import_module(
            "contrastyou.projectors.heads"))
        dmi = _with_stubs(lambda: importlib.import_module(
            "contrastyou.losses.discreteMI"))
        autils = _with_stubs(lambda: importlib.import_module(
            "contrastyou.arch.utils"))
        K, S = UDAIIC["K"], UDAIIC["S"]
        torch.manual_seed(cfg["seed"] + 100)   # projector init stream
        enc_proj = heads.ClusterHead(
            input_dim=model.get_channel_dim("Conv5"), num_clusters=K,
            num_subheads=S, head_type="linear", T=1, normalize=False)
        dense_proj = heads.DenseClusterHead(
            input_dim=model.get_channel_dim("Up_conv2"), num_clusters=K,
            num_subheads=S, head_type="linear", T=1, normalize=False)
        _export_udaiic_projectors(cfg, enc_proj, dense_proj, K, S)
        enc_crit_raw = dmi.IIDLoss()
        dense_crit = dmi.IIDSegmentationLoss(padding=UDAIIC["padding"])
        ext5 = autils.SingleFeatureExtractor(model, feature_name="Conv5")
        ext2 = autils.SingleFeatureExtractor(model, feature_name="Up_conv2")
        ext5.bind()
        ext2.bind()
        opt = torch.optim.RAdam(
            list(model.parameters()) + list(enc_proj.parameters())
            + list(dense_proj.parameters()),
            lr=cfg["lr"], weight_decay=cfg["weight_decay"])
        aux = dict(enc_proj=enc_proj, dense_proj=dense_proj,
                   enc_crit=lambda a, b: enc_crit_raw(a, b)[0],
                   dense_crit=dense_crit, ext5=ext5, ext2=ext2)
    if what == "pretrain":
        heads = _with_stubs(lambda: importlib.import_module(
            "contrastyou.projectors.heads"))
        contrastive = _with_stubs(lambda: importlib.import_module(
            "contrastyou.losses.contrastive"))
        autils = _with_stubs(lambda: importlib.import_module(
            "contrastyou.arch.utils"))
        torch.manual_seed(cfg["seed"] + 100)
        nce_proj = heads.ProjectionHead(
            input_dim=model.get_channel_dim("Conv5"), hidden_dim=256,
            output_dim=256, head_type="mlp", normalize=True)
        _export_nce_projector(cfg, nce_proj)
        ext5 = autils.SingleFeatureExtractor(model, feature_name="Conv5")
        ext5.bind()
        nce_opt = torch.optim.RAdam(
            list(model.parameters()) + list(nce_proj.parameters()),
            lr=cfg["lr"], weight_decay=cfg["weight_decay"])
        nce_crit = contrastive.SupConLoss1(
            temperature=PRETRAIN["temperature"])
        aux = dict(nce_proj=nce_proj, nce_opt=nce_opt, nce_crit=nce_crit,
                   ext5=ext5)
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
    if what == "pretrain":
        # phase 1: encoder InfoNCE on Conv5 (truncated forward), pinned
        # W-flip second view, SupCon target = partition labels — the
        # reference pretrain epocher shape (semi_seg/trainers/pretrain.py:
        # 57-79 + hooks/infonce.py:196-249); then the main loop below
        # finetunes the SAME model with a fresh optimizer.
        pidx = batch_sequence(len(timg), cfg, PRETRAIN["steps"],
                              seed_offset=50)
        for it in range(PRETRAIN["steps"]):
            u = torch.from_numpy(timg[pidx[it]]).unsqueeze(1)
            part = torch.from_numpy(tpart[pidx[it]])
            u_tf = torch.flip(u, [-1])
            aux["nce_opt"].zero_grad()
            aux["ext5"].clear()
            aux["ext5"].set_enable(True)
            model(torch.cat([u, u_tf], 0), until="Conv5")
            aux["ext5"].set_enable(False)
            f = aux["ext5"].feature()[-2 * u.shape[0]:]
            fu, futf = torch.chunk(f, 2, 0)
            z = aux["nce_proj"](torch.cat([torch.flip(fu, [-1]), futf], 0))
            z1, z2 = torch.chunk(z, 2, 0)
            loss = PRETRAIN["weight"] * aux["nce_crit"](z1, z2, target=part)
            loss.backward()
            aux["nce_opt"].step()
            if (it + 1) % 100 == 0:
                print(f"[ref pretrain] step {it+1}: nce={float(loss):.4f}")
        aux["ext5"].remove()
        # export the POST-pretrain torch weights: the jax side's
        # `--what pretrain_xenc` finetunes from THIS encoder, separating
        # accumulated pretrain drift from ft-semantics drift
        from contrastyou_tpu.utils.torch_convert import (
            convert_unet_state_dict, save_npz_tree)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        save_npz_tree(str(_init_archive(cfg)).replace(
            ".npz", "_posttrain.npz"), convert_unet_state_dict(sd))
    curve = []
    t_accum, n_timed = 0.0, 0
    for it in range(steps):
        x = torch.from_numpy(timg[idxs[it]]).unsqueeze(1)
        y = torch.from_numpy(ttgt[idxs[it]])
        t0 = time.perf_counter()
        opt.zero_grad()
        if what == "udaiic":
            for e in (aux["ext5"], aux["ext2"]):
                e.clear()
                e.set_enable(True)
        logits = model(x)
        loss = crit(logits.softmax(1), onehot(y))
        if what == "udaiic":
            import torch.nn.functional as F
            n = x.shape[0]
            u, u_tf = x, torch.flip(x, [-1])
            both = model(torch.cat([u, u_tf], 0))
            for e in (aux["ext5"], aux["ext2"]):
                e.set_enable(False)
            su, sutf = torch.chunk(both, 2, 0)
            # consistency (semi_seg/hooks/consistency.py:31-39): MSE of the
            # tf-view probs against the detached transformed view-1 probs
            prob_tf = torch.flip(su.softmax(1), [-1]).detach()
            cons = F.mse_loss(prob_tf, sutf.softmax(1))
            f5 = aux["ext5"].feature()[-2 * n:]
            f2 = aux["ext2"].feature()[-2 * n:]
            f5u, f5utf = torch.chunk(f5, 2, 0)
            f2u, f2utf = torch.chunk(f2, 2, 0)
            enc_probs = aux["enc_proj"](
                torch.cat([torch.flip(f5u, [-1]), f5utf], 0))
            enc_mi = sum(aux["enc_crit"](p[:n], p[n:])
                         for p in enc_probs) / len(enc_probs)
            dense_probs = aux["dense_proj"](
                torch.cat([torch.flip(f2u, [-1]), f2utf], 0))
            dense_mi = sum(aux["dense_crit"](p[:n], p[n:])
                           for p in dense_probs) / len(dense_probs)
            loss = (loss + UDAIIC["cons_w"] * cons
                    + UDAIIC["enc_w"] * enc_mi
                    + UDAIIC["dense_w"] * dense_mi)
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
            print(f"[ref {what}] step {it+1}: loss={float(loss):.5f}")
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

    if what in ("mt", "udaiic", "pretrain"):
        # match the torch harness's flip view exactly: pin the two-view
        # transform to a deterministic W-flip with no intensity jitter, so
        # both sides solve the same consistency task (the full affine+gamma
        # pipeline is the production default — measured separately)
        import contrastyou_tpu.engine.steps as steps_mod
        import contrastyou_tpu.trainers.pretrain as pretrain_mod
        from contrastyou_tpu.ops import affine as aff

        def flip_geo(key, batch, **kw):
            z = jnp.zeros((batch,))
            return aff.GeoParams(scale=jnp.ones((batch,)), angle=z, tx=z,
                                 ty=z, flip_h=jnp.zeros((batch,), bool),
                                 flip_w=jnp.ones((batch,), bool))

        def flip_image(img, geo, key):
            return aff.apply_geometric(img, geo, order=0)

        steps_mod.sample_geo_params = flip_geo
        steps_mod.transform_image = flip_image
        pretrain_mod.sample_geo_params = flip_geo
        pretrain_mod.transform_image = flip_image

    (timg, ttgt, tscan, tpart), (vimg, vtgt, vscan, _) = make_data(cfg)
    C = cfg["num_classes"]
    model = UNet(input_dim=1, num_classes=C, max_channel=cfg["max_channel"],
                 momentum=cfg["bn_momentum"], dtype=jnp.float32)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(cfg["seed"]),
                                (cfg["crop"], cfg["crop"], 1))
    init_path = _init_archive(cfg)
    what_label = what
    if what == "pretrain_xenc":
        # ft from the TORCH side's post-pretrain encoder: isolates
        # ft-semantics drift from accumulated pretrain weight drift
        init_path = Path(str(init_path).replace(".npz", "_posttrain.npz"))
        what = "ft"
    if init_path.exists():
        from contrastyou_tpu.utils.torch_convert import load_npz_tree
        tree = load_npz_tree(str(init_path))
        bundle.params = jax.tree.map(jnp.asarray, tree["params"])
        bundle.batch_stats = jax.tree.map(jnp.asarray, tree["batch_stats"])
        print("[jax] warm-started from the torch reference init "
              f"({init_path.name})")
    if what == "pretrain":
        # phase 1: encoder InfoNCE@Conv5 from the SAME torch init, pinned
        # flip view, matched partition labels + batch sequence; the
        # pretrained encoder (params + BN stats) then seeds the ft loop
        from contrastyou_tpu.hooks import INFONCEHook
        from contrastyou_tpu.trainers.pretrain import build_pretrain_step
        nce_hook = INFONCEHook(name="infonce", feature_name="Conv5",
                               weight=PRETRAIN["weight"],
                               contrast_on="partition",
                               temperature=PRETRAIN["temperature"])
        pre_opt, _ = create_optimizer(
            {"name": "RAdam", "lr": cfg["lr"],
             "weight_decay": cfg["weight_decay"]}, None,
            max_epoch=1, steps_per_epoch=PRETRAIN["steps"])
        pre_state = init_train_state(bundle, [nce_hook], pre_opt,
                                     jax.random.PRNGKey(cfg["seed"] + 1))
        z = np.load(_nce_proj_archive(cfg))
        hp = {"infonce": {"Dense_0": {"kernel": jnp.asarray(z["k0"]),
                                      "bias": jnp.asarray(z["b0"])},
                          "Dense_1": {"kernel": jnp.asarray(z["k1"]),
                                      "bias": jnp.asarray(z["b1"])}}}
        assert (jax.tree.structure(hp)
                == jax.tree.structure(pre_state.hook_params)), \
            jax.tree.structure(pre_state.hook_params)
        pre_state = pre_state.replace(
            hook_params=hp, opt_state=pre_opt.init((pre_state.params, hp)))
        print("[jax] pretrain projector warm-started from the torch init")
        pstep = build_pretrain_step(bundle, pre_opt, [nce_hook],
                                    until="Conv5", total_freedom=False,
                                    color_jitter=0.0)
        pidx = batch_sequence(len(timg), cfg, PRETRAIN["steps"],
                              seed_offset=50)
        prng = jax.random.PRNGKey(cfg["seed"] + 3)
        zvec = jnp.zeros((cfg["batch"],), jnp.int32)
        for it in range(PRETRAIN["steps"]):
            pbatch = {"image": jnp.asarray(timg[pidx[it]])[..., None],
                      "partition": jnp.asarray(
                          tpart[pidx[it]].astype(np.int32)),
                      "scan_id": zvec, "patient": zvec, "cycle": zvec}
            pre_state, pm = pstep(pre_state, pbatch,
                                  jax.random.fold_in(prng, it), jnp.int32(0))
            if (it + 1) % 100 == 0:
                print(f"[jax pretrain] step {it+1}: "
                      f"nce={float(pm['reg_loss']):.4f}")
        bundle.params = jax.tree.map(jnp.array, pre_state.params)
        bundle.batch_stats = jax.tree.map(jnp.array, pre_state.batch_stats)

    hooks = []
    if what == "mt":
        hooks = [MeanTeacherTrainerHook(weight=0.1, alpha=MT_ALPHA)]
    if what == "udaiic":
        from contrastyou_tpu.hooks import (ConsistencyTrainerHook,
                                           DiscreteMITrainHook)
        hooks = [ConsistencyTrainerHook(weight=UDAIIC["cons_w"]),
                 DiscreteMITrainHook(name="iic5", feature_name="Conv5",
                                     weight=UDAIIC["enc_w"],
                                     num_clusters=UDAIIC["K"],
                                     num_subheads=UDAIIC["S"]),
                 DiscreteMITrainHook(name="iic2", feature_name="Up_conv2",
                                     weight=UDAIIC["dense_w"],
                                     num_clusters=UDAIIC["K"],
                                     num_subheads=UDAIIC["S"],
                                     padding=UDAIIC["padding"])]
    optimizer, _ = create_optimizer(
        {"name": "RAdam", "lr": cfg["lr"],
         "weight_decay": cfg["weight_decay"]}, None,
        max_epoch=1, steps_per_epoch=steps)
    state = init_train_state(bundle, hooks, optimizer,
                             jax.random.PRNGKey(cfg["seed"] + 1))
    if what == "udaiic":
        z = np.load(_udaiic_proj_archive(cfg))
        hp = dict(state.hook_params)
        hp["iic5"] = {"Vmap_SubHead_0": {
            "Dense_0": {"kernel": jnp.asarray(z["enc_kernel"]),
                        "bias": jnp.asarray(z["enc_bias"])}}}
        hp["iic2"] = {"Vmap_DenseSubHead_0": {
            "Conv_0": {"kernel": jnp.asarray(z["dense_kernel"]),
                       "bias": jnp.asarray(z["dense_bias"])}}}
        assert (jax.tree.structure(hp)
                == jax.tree.structure(state.hook_params)), \
            jax.tree.structure(state.hook_params)
        for a, b in zip(jax.tree.leaves(hp),
                        jax.tree.leaves(state.hook_params)):
            assert a.shape == b.shape, (a.shape, b.shape)
        state = state.replace(
            hook_params=hp, opt_state=optimizer.init((state.params, hp)))
        print("[jax] udaiic projectors warm-started from the torch init")
    # disable_bn for mt: the affine-transformed view's zero borders pollute
    # BN running stats on short runs (the reference's own knob for this,
    # config Trainer.disable_bn; the torch loop's flip view has no borders)
    step = build_train_step(bundle, optimizer, hooks,
                            mode="semi" if what in ("mt", "udaiic")
                            else "ft", two_stage=True,
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
        if what in ("mt", "udaiic"):
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
            tot = float(metrics.get("total_loss",
                                    metrics.get("sup_loss", 0.0)))
            print(f"[jax {what}] step {it+1}: loss={tot:.5f}")
            print(f"[jax {what}] step {it+1}: dice={curve[-1][1]:.4f} "
                  f"({n_timed / max(t_accum, 1e-9):.3f} steps/s)")
    return dict(side="jax", what=what_label, config=cfg, steps=steps,
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
    for what in ("ft", "mt", "udaiic", "pretrain", "timing"):
        a, b = by.get(("jax", what)), by.get(("ref", what))
        if a and b:
            print(f"{what}: rebuild/reference steps/s ratio on this host = "
                  f"{a['steps_per_s'] / b['steps_per_s']:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "jax"])
    ap.add_argument("--what",
                    choices=["ft", "mt", "udaiic", "pretrain",
                             "pretrain_xenc", "timing"],
                    default="ft")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--pretrain-steps", type=int, default=None,
                    help="override PRETRAIN['steps'] (phase-1 length)")
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        report()
        return
    if args.side == "ref" and args.what == "pretrain_xenc":
        raise SystemExit("pretrain_xenc is jax-side only: it finetunes from "
                         "the torch run's exported post-pretrain encoder — "
                         "compare against ref_pretrain's ft curve")
    cfg = TIMING_CFG if args.what == "timing" else CFG
    if args.pretrain_steps:
        PRETRAIN["steps"] = args.pretrain_steps
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
