"""Config-keyed hook factory — hooks are selected by the PRESENCE of their
config section, with the same key names as the reference so its YAML presets
port unchanged (ref: hook_creator.py:9-116 + semi_seg/hooks/creator.py:31-279).
"""
from __future__ import annotations

import typing as t

from ..loggers import logger
from ..models import UNet
from ..utils import ntuple
from .autoencoder import DenoisingAutoEncoderTrainerHook
from .consistency import ConsistencyTrainerHook
from .discretemi import DiscreteIMSATTrainHook, DiscreteMITrainHook
from .entmin import EntropyMinTrainerHook
from .infonce import INFONCEHook, SelfPacedINFONCEHook, SuperPixelInfoNCEHook
from .midl import IIDSegmentationTrainerHook, IMSATTrainHook
from .mixup import MixUpTrainHook
from .mt import (EMAEvalTrainerHook, ICTMeanTeacherTrainerHook,
                 MeanTeacherTrainerHook, UAMeanTeacherTrainerHook)
from .orthogonal import OrthogonalTrainerHook
from .pseudolabel import PseudoLabelTrainerHook

DECODER_NAMES = UNet.decoder_names


def create_infonce_hooks(*, feature_names, weights, contrast_ons, spatial_size,
                         data_name: str) -> t.List[INFONCEHook]:
    n = 1 if isinstance(feature_names, str) else len(feature_names)
    pg = ntuple(n)
    hooks = []
    for f, w, c, ss in zip(pg(feature_names), pg(weights), pg(contrast_ons),
                           pg(spatial_size)):
        hooks.append(INFONCEHook(
            name=f"infonce/{f}/{c}", feature_name=f, weight=float(w),
            contrast_on=c, data_name=data_name,
            spatial_size=None if f in UNet.encoder_names else (ss, ss)))
    return hooks


def create_sp_infonce_hooks(*, feature_names, weights, contrast_ons, data_name,
                            begin_values=1e10, end_values=1e10, mode="soft",
                            p=0.5, max_epoch: int, correct_grad=False
                            ) -> t.List[SelfPacedINFONCEHook]:
    n = 1 if isinstance(feature_names, str) else len(feature_names)
    pg = ntuple(n)
    hooks = []
    for f, w, c, b, e, g in zip(pg(feature_names), pg(weights),
                                pg(contrast_ons), pg(begin_values),
                                pg(end_values), pg(correct_grad)):
        hooks.append(SelfPacedINFONCEHook(
            name=f"spinfonce/{f}/{c}", feature_name=f, weight=float(w),
            contrast_on=c, data_name=data_name, mode=mode, p=float(p),
            begin_value=float(b), end_value=float(e), max_epoch=int(max_epoch),
            correct_grad=bool(g),
            spatial_size=None if f in UNet.encoder_names else (16, 16)))
    return hooks


def create_superpixel_hooks(*, feature_names, weights, spatial_size,
                            data_name) -> t.List[SuperPixelInfoNCEHook]:
    n = 1 if isinstance(feature_names, str) else len(feature_names)
    pg = ntuple(n)
    return [SuperPixelInfoNCEHook(
        name=f"infonce/{f}/superpixel", feature_name=f, weight=float(w),
        contrast_on="self", data_name=data_name, spatial_size=(ss, ss))
        for f, w, ss in zip(pg(feature_names), pg(weights), pg(spatial_size))]


def create_discrete_mi_consistency_hooks(*, feature_names, mi_weights,
                                         dense_paddings=None,
                                         consistency_weight: float
                                         ) -> t.List:
    n = 1 if isinstance(feature_names, str) else len(feature_names)
    pg = ntuple(n)
    feature_names = pg(feature_names)
    mi_weights = pg(mi_weights)
    dense_features = [f for f in feature_names if f in DECODER_NAMES]
    dense_paddings = ntuple(len(dense_features))(dense_paddings)
    pad_iter = iter(dense_paddings)
    hooks: t.List = []
    for f, w in zip(feature_names, mi_weights):
        padding = next(pad_iter) if f in DECODER_NAMES else None
        hooks.append(DiscreteMITrainHook(name=f"discreteMI/{f.lower()}",
                                         feature_name=f, weight=float(w),
                                         padding=padding or 0))
    hooks.append(ConsistencyTrainerHook(name="consistency",
                                        weight=float(consistency_weight)))
    return hooks


def create_hook_from_config(config: t.Mapping, *, is_pretrain: bool = False,
                            trainer=None) -> t.List:
    """Build the hook list from reference-compatible config sections."""
    data_name = config["Data"]["name"]
    max_epoch = config["Trainer"]["max_epoch"]
    num_classes = int(config.get("OPT", {}).get("num_classes", 4))
    hooks: t.List = []
    mt_hook = None

    def not_pretrain(key: str):
        if is_pretrain:
            raise RuntimeError(f"`{key}` is not supported for pretrain stage")

    if "InfonceParams" in config:
        hooks += create_infonce_hooks(data_name=data_name,
                                      **config["InfonceParams"])
    if "SPInfonceParams" in config:
        hooks += create_sp_infonce_hooks(data_name=data_name,
                                         max_epoch=max_epoch,
                                         **config["SPInfonceParams"])
    if "DiscreteMIConsistencyParams" in config:
        not_pretrain("DiscreteMIConsistencyParams")
        hooks += create_discrete_mi_consistency_hooks(
            **config["DiscreteMIConsistencyParams"])
    if "MeanTeacherParameters" in config:
        not_pretrain("MeanTeacherParameters")
        params = dict(config["MeanTeacherParameters"])
        # ref semi_seg/hooks/mt.py:94-95 validates num_teachers and errors
        # for >1 — match that instead of silently dropping the key
        num_teachers = int(params.pop("num_teachers", 1))
        if num_teachers > 1:
            raise NotImplementedError(
                f"num_teachers={num_teachers}: only one mean teacher is "
                "supported (matches the reference's validation)")
        mt_hook = MeanTeacherTrainerHook(name="mt", **params)
        hooks.append(mt_hook)
    if "UAMeanTeacherParameters" in config:
        not_pretrain("UAMeanTeacherParameters")
        mt_hook = UAMeanTeacherTrainerHook(name="uamt", max_epoch=max_epoch,
                                           **config["UAMeanTeacherParameters"])
        hooks.append(mt_hook)
    if "ICTMeanTeacherParameters" in config:
        not_pretrain("ICTMeanTeacherParameters")
        mt_hook = ICTMeanTeacherTrainerHook(name="ict",
                                            **config["ICTMeanTeacherParameters"])
        hooks.append(mt_hook)
    if "DifferentiableMeanTeacherParameters" in config:
        not_pretrain("DifferentiableMeanTeacherParameters")
        from .dmt import DifferentiableMeanTeacherTrainerHook
        mt_hook = DifferentiableMeanTeacherTrainerHook(
            name="dmt", **config["DifferentiableMeanTeacherParameters"])
        hooks.append(mt_hook)
    if "EntropyMinParameters" in config:
        hooks.append(EntropyMinTrainerHook(
            name="entropy", weight=float(config["EntropyMinParameters"]["weight"])))
    if "OrthogonalParameters" in config:
        hooks.append(OrthogonalTrainerHook(
            hook_name="orth", weight=float(config["OrthogonalParameters"]["weight"])))
    if "IIDSegParameters" in config:
        hooks.append(IIDSegmentationTrainerHook(
            hook_name="iidseg", weight=float(config["IIDSegParameters"]["weight"]),
            mi_lambda=float(config["IIDSegParameters"].get("mi_lambda", 1.0))))
    if "PsuedoLabelParams" in config:
        hooks.append(PseudoLabelTrainerHook(
            name="plab", weight=float(config["PsuedoLabelParams"]["weight"])))
    if "IMSATParameters" in config:
        hooks.append(IMSATTrainHook(
            hook_name="imsat", weight=float(config["IMSATParameters"]["weight"])))
    if "IMSATFeatureParameters" in config:
        p = dict(config["IMSATFeatureParameters"])
        hooks.append(DiscreteIMSATTrainHook(
            name=f"discreteIMSAT/{p['feature_name'].lower()}",
            feature_name=p["feature_name"], weight=float(p["weight"]),
            num_clusters=int(p["num_clusters"]), num_subheads=3,
            cons_weight=float(p["cons_weight"])))
    for key in [k for k in config if "CrossCorrelationParameters" in str(k)]:
        from .ccblock import create_cross_correlation_hook
        hooks.append(create_cross_correlation_hook(num_classes=num_classes,
                                                   **config[key]))
    if "ConsistencyParameters" in config:
        hooks.append(ConsistencyTrainerHook(
            name="consistency",
            weight=float(config["ConsistencyParameters"]["weight"])))
    if "MixUpParams" in config:
        hooks.append(MixUpTrainHook(
            hook_name="mixup", weight=float(config["MixUpParams"]["weight"]),
            enable_bn=bool(config["MixUpParams"].get("enable_bn", True))))
    if "DAEParameters" in config:
        hooks.append(DenoisingAutoEncoderTrainerHook(
            hook_name="dae", weight=float(config["DAEParameters"]["weight"]),
            num_classes=num_classes))
    if "InfonceSuperPixelParams" in config:
        hooks += create_superpixel_hooks(
            data_name=data_name,
            weights=config["InfonceSuperPixelParams"]["weights"],
            spatial_size=config["InfonceSuperPixelParams"]["spatial_size"],
            feature_names=config["InfonceSuperPixelParams"]["feature_names"])

    ema_hook = None
    if "EvalEMAParameters" in config:
        # TPU-build extra: loss-free EMA of the student evaluated instead of
        # the student (works under ft via always_active; see hooks/mt.py)
        ema_hook = EMAEvalTrainerHook(**dict(config["EvalEMAParameters"]))
        hooks.append(ema_hook)

    # Eval-model precedence: an EXPLICIT EvalEMAParameters request wins over
    # the MT teacher (previously the MT hook silently overwrote it while the
    # EMA hook kept paying its per-step update — ADVICE r3).
    if trainer is not None:
        if ema_hook is not None:
            trainer.set_model4inference(ema_hook)
            if mt_hook is not None:
                logger.info("eval model: EvalEMAParameters EMA "
                            "(takes precedence over the MT teacher)")
            else:
                logger.info("eval model: EvalEMAParameters EMA")
        elif mt_hook is not None:
            trainer.set_model4inference(mt_hook)
            logger.info("eval model: mean-teacher")
    logger.info(f"created hooks: {[h.name for h in hooks]}")
    return hooks
