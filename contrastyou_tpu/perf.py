"""Central registry for the performance/routing knobs.

Every kernel-routing and numerics-affecting toggle in the framework reads
through :func:`get` so that (a) defaults live in ONE table, (b) a run's
exact routing can be captured with :func:`snapshot` and recorded in the
dumped config + checkpoint, and (c) a ``Perf:`` config section can set
knobs from the config file (environment variables still win as explicit
overrides — VERDICT r3 #9).

Knob semantics are documented at their consuming call sites (CLAUDE.md has
the measured A/B story for each); ``""`` means "auto" — the call site picks
a platform-appropriate default (e.g. Pallas routing on TPU, XLA on CPU).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Mapping

__all__ = ["KNOBS", "get", "snapshot", "apply_config", "STRUCTURAL_KNOBS",
           "enable_compile_cache"]

_PREFIX = "CONTRASTYOU_"

#: knob name -> default (string). "" = auto-resolved at the call site.
KNOBS: Dict[str, str] = {
    # conv-stage routing (ops/pallas/convblock.py, models/unet.py)
    "PALLAS_CONV": "",      # "" auto: plane kernels on TPU, XLA on CPU
    "PALLAS_DEEP": "",      # "" off; "1" all C>=128 levels; "128,256" list
    "PLANE_CHAIN": "1",     # keep plane layout across pool/skip boundaries
    "PLANE_UPCONV": "up2",  # plane upsample+conv: "0"|"1"|"up2"
    "PLANE_DYG": "1",       # dy-grouped 3x3 kernel form
    "PLANE_NMERGE": "",     # one [3r,3Cout] dot instead of three [3r,Cout]
                            # dots in the dyg kernel ("" auto: Cout<128 —
                            # fills the MXU's 128-wide output tile)
    "PLANE_ALIGN": "0",     # pad plane rows to 128-multiples
    "PLANE_PARITY": "",     # "" auto: parity chain ON (train + fwd-only;
                            # round-4 flip — wins under the lbuf-weighted
                            # geometry: 14.63 vs 15.01 ms whole-model);
                            # "fwd" = fwd-only passes only, "0" = off
    "PLANE_BNVJP": "1",     # residual-free BN+ReLU apply backward
    "PLANE_FUSEDBWD": "",   # single-pass dx+dW plane-conv backward; ""
                            # auto: on from batch 96 (decoder-pretrain
                            # 320.7 -> 277.9 ms r5 — the einsum dW is
                            # layout-bound at large batch), off at the
                            # reference batch (measured worse r4: 15.56
                            # vs 15.01 ms — the in-kernel dW matmul
                            # serializes what XLA overlaps there)
    "PLANE_POOLVJP": "1",   # scatter-free plane-pool backward
    "PLANE_UPVJP": "1",     # custom upconv-interleave backward
    "PLANE_ILV2": "1",      # two-pass upconv interleave
    "PLANE_DW": "",         # Pallas plane weight-grad kernel; "" auto:
                            # on from batch 96 (the XLA sliced-einsum dW
                            # is layout-bound there — 11.4 vs 6.8 ms per
                            # dW at pretrain batch 96, scripts_perf_dw),
                            # off at the reference batch (r3/r4 A/Bs)
    "PLANE_GEOCOST": "",    # lbuf weight in the plane-geometry cost (float;
                            # "" auto: 1.0 when the parity chain routes,
                            # 0.5 when PLANE_PARITY=0 — the measured-best
                            # pairing per routing; 0 = legacy
                            # window-traffic-only cost; >0 trades kernel
                            # window re-reads for smaller guarded buffers —
                            # elementwise/backward passes scale with lbuf,
                            # see _pick_geometry)
    # step/optimizer structure
    "FUSED_OPT": "1",       # ravel small leaves around the optax chain
    "FUSED_TWOSTAGE": "0",  # one conv pass over cat(l, u, u_tf) w/ BN groups
    # loss kernels / numerics
    "IIC_MERGED": "",       # "" auto: fused Pallas IIC kernel on TPU
    "IIC_BF16": "1",        # bf16 feature path into the IIC loss
    "NCE_BF16": "1",        # bf16 feature warp in dense InfoNCE
    "PROJ_BF16": "",        # bf16 compute in DenseProjectionHead's 1x1
                            # convs ("" auto: TPU only; pooling/normalize
                            # stay f32 — models/projectors.py)
    "POOL_EARLY": "",       # avg-pool before the output 1x1 conv in
                            # DenseProjectionHead (exact commute). "" auto
                            # follows the head's compute dtype — f32 world:
                            # measured worse (462.4 vs 458.4 ms 2x2 A/B,
                            # costs a fusion; reference op order kept);
                            # PROJ_BF16 world: deletes the full-res output
                            # conv + backward (decoder 273.7 -> 268.7 ms).
                            # "1"/"0" force (heads.py:104-127 = "0").
    "FAST_WARP": "",        # "" auto: two-pass nearest warp on TPU
    "WARP_ONEHOT": "",      # fast-warp 1-D passes as one-hot MXU matmuls
                            # for wide-channel maps: "" auto (C>=8),
                            # "1" always, "0" never (ops/affine.py)
    # host->device input pipeline (data/wire.py)
    "WIRE_U8": "1",         # pack f32 k/255 images + small ints as u8/u16
                            # on the wire (lossless-or-fallback; the tunnel
                            # runs ~50 MB/s so bytes are the bottleneck)
    "DEVICE_PREFETCH": "2",  # device-side prefetch depth for host-fed
                             # training (0 disables the pipeline thread)
    # measured-off experiments kept for re-measurement
    "MXU_BN": "0",          # BN reductions as MXU matmuls
    "MXU_CROP": "0",        # one-hot-matmul random crop
    # process infrastructure
    "COMPILE_CACHE": "",    # persistent XLA compile cache: "" = on at the
                            # default dir, "0" = off, else = cache dir
}

#: knobs that change the STRUCTURE of saved state (opt_state pytree shape):
#: a checkpoint written under one value cannot be restored under another.
STRUCTURAL_KNOBS = ("FUSED_OPT",)


def get(name: str) -> str:
    """Effective value of knob ``name``: explicit env var if set, else the
    registry default (which apply_config may have overridden from config)."""
    return os.environ.get(_PREFIX + name, KNOBS[name])


def snapshot() -> Dict[str, str]:
    """The exact routing of this process right now — recorded in
    dump_config and checkpoints so a run dir alone reproduces it."""
    return {name: get(name) for name in sorted(KNOBS)}


def apply_config(section: Mapping[str, Any] | None) -> Dict[str, str]:
    """Apply a config-file ``Perf:`` section: each key (case-insensitive,
    e.g. ``plane_chain: "0"``) becomes the knob's default for this process.
    An explicitly-set environment variable still wins (env is the override
    channel). Returns the resulting snapshot. Unknown keys error — typos in
    perf knobs must not silently no-op."""
    if section:
        changed = set()
        for key, value in section.items():
            name = str(key).upper()
            if name not in KNOBS:
                raise KeyError(
                    f"Perf.{key}: unknown knob (known: {sorted(KNOBS)})")
            if _PREFIX + name not in os.environ:
                if KNOBS[name] != _coerce(value):
                    changed.add(name)
                KNOBS[name] = _coerce(value)
        # COMPILE_CACHE runs once at package import from the then-current
        # value; a config-file change must re-apply it or it silently no-ops
        # (advisor r4). Env still wins inside enable_compile_cache itself.
        if "COMPILE_CACHE" in changed:
            enable_compile_cache(force=True)
    return snapshot()


#: path we last pointed jax_compilation_cache_dir at (None = not by us).
_cache_dir_set: str | None = None


def enable_compile_cache(force: bool = False) -> str | None:
    """Point JAX at a persistent on-disk compilation cache.

    The axon TPU backend compiles through a remote tunnel — first compiles
    of the big train-step graphs take MINUTES and, without this, every new
    process pays them again (a single perf-script variant measured >9.7 min
    cold vs seconds warm).  Called at package import and re-invoked by
    :func:`apply_config` when a ``Perf: compile_cache:`` entry changes the
    knob; ``CONTRASTYOU_COMPILE_CACHE=0`` disables, a path value overrides
    the default location.  If an embedding application already set
    ``jax_compilation_cache_dir`` itself, we leave it alone (unless we were
    the ones who set it and ``force`` asks for a re-apply).  The 2-second
    min-compile-time gate keeps tiny CPU test compiles off disk.
    """
    global _cache_dir_set
    value = os.environ.get(_PREFIX + "COMPILE_CACHE", KNOBS["COMPILE_CACHE"])
    try:
        import jax
        current = jax.config.jax_compilation_cache_dir
    except Exception:  # pragma: no cover - ancient jax
        return None
    if value == "0":
        if _cache_dir_set is not None and current == _cache_dir_set:
            jax.config.update("jax_compilation_cache_dir", None)
            _cache_dir_set = None
        return None
    if current is not None and current != _cache_dir_set:
        return current  # an embedding app set its own cache dir — keep it
    path = os.path.expanduser(
        value or os.path.join("~", ".cache", "contrastyou_tpu", "xla"))
    if current == path and not force:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _cache_dir_set = path
    except Exception as exc:  # pragma: no cover - read-only FS
        import logging
        logging.getLogger(__name__).warning(
            "persistent XLA compile cache disabled (%s): %s",
            path, exc)
        return None
    return path


def _coerce(value: Any) -> str:
    if value is True:
        return "1"
    if value is False:
        return "0"
    return str(value)
