#!/usr/bin/env python
"""Roofline floor analysis for the bench train step (VERDICT r4 #2).

Derives, from first principles (FLOPs and bytes at this chip's rooflines),
a defensible per-level ms floor for the headline semi train step
(config/base.yaml shape: 5 labeled + 5 unlabeled + 5 warped unlabeled
224x224 slices through the max_channel=512 UNet, fwd+bwd), and prints the
table that BENCH_NOTES.md's "Round-5 floor analysis" section records.

Hardware model (TPU v5e / "v5 lite", one chip):
- MXU peak 197 TFLOP/s bf16. A conv lowered to an implicit matmul
  [M, K] x [K, N] occupies the MXU for ceil(K/128)*ceil(N/128)*M MACs of
  SYSTOLIC time regardless of how little of each 128-tile is real work, so
  the compute floor uses PADDED flops: 2*M*ceil128(K)*ceil128(N).
  (The plane kernels' dy-grouped form contracts K=3*Cin taps x3 dots;
  full-K im2col contracts K=9*Cin once. We floor with the BEST of the two
  paddings per conv — the kernel is free to pick its layout.)
- HBM 819 GB/s. The bandwidth floor counts the unavoidable traffic of a
  fused implementation: fwd reads the level input + writes the level
  output once per conv (bf16), BN stats ride in registers/VMEM; bwd reads
  the saved bf16 input and cotangent and writes dx (the BNVJP path saves
  no f32 residuals). Weights are negligible at these shapes (<2 MB/level).

Reference FLOP anchor: the conv pair of every level,
/root/reference/contrastyou/arch/unet.py:16-31 (Conv 3x3 + BN + ReLU x2).
"""
from __future__ import annotations

import math

PEAK_BF16 = 197e12     # FLOP/s
HBM_BW = 819e9         # B/s
B_EFF = 15             # 5 labeled + 5 unlabeled + 5 unlabeled_tf, fwd+bwd
SIZE = 224
NUM_CLASSES = 4


def ceil128(x: int) -> int:
    return 128 * math.ceil(x / 128)


def conv_cost(m: int, cin: int, cout: int):
    """One 3x3 conv as implicit matmul: returns (real_flops, padded_flops,
    io_bytes_fwd). m = B*H*W output positions."""
    real = 2 * m * 9 * cin * cout
    # layout choice: one K=9*Cin dot vs three K=3*Cin dots (dy-grouped)
    pad_full = 2 * m * ceil128(9 * cin) * ceil128(cout)
    pad_dyg = 3 * (2 * m * ceil128(3 * cin) * ceil128(cout))
    padded = min(pad_full, pad_dyg)
    io = 2 * m * (cin + cout)  # bf16 read input + write output
    return real, padded, io


def level(name, h, cin, cout, convs):
    """A ConvBlock level: `convs` = [(cin, cout), ...] at resolution h."""
    m = B_EFF * h * h
    real = padded = io = 0
    for ci, co in convs:
        r, p, i = conv_cost(m, ci, co)
        real, padded, io = real + r, padded + p, io + i
    # fwd+bwd: dx is a transposed conv (same shape classes), dW contracts
    # the same patches -> 3x flops; bwd IO: read ct + saved input, write dx
    return {"name": name, "h": h, "real": 3 * real, "padded": 3 * padded,
            "io": io + 2 * io}


def main():
    mc = 512
    w = {1: mc // 16, 2: mc // 8, 3: mc // 4, 4: mc // 2, 5: mc}
    levels = [
        level("Conv1", 224, 1, w[1], [(1, w[1]), (w[1], w[1])]),
        level("Conv2", 112, w[1], w[2], [(w[1], w[2]), (w[2], w[2])]),
        level("Conv3", 56, w[2], w[3], [(w[2], w[3]), (w[3], w[3])]),
        level("Conv4", 28, w[3], w[4], [(w[3], w[4]), (w[4], w[4])]),
        level("Conv5", 14, w[4], w[5], [(w[4], w[5]), (w[5], w[5])]),
        # decoder: Up = upsample + 3x3 conv (half the channels), then
        # Up_conv on the skip-concat (2*cout -> cout via split-input conv)
        level("Up5+Up_conv5", 28, 0, 0, [(w[5], w[4]), (2 * w[4], w[4]),
                                         (w[4], w[4])]),
        level("Up4+Up_conv4", 56, 0, 0, [(w[4], w[3]), (2 * w[3], w[3]),
                                         (w[3], w[3])]),
        level("Up3+Up_conv3", 112, 0, 0, [(w[3], w[2]), (2 * w[2], w[2]),
                                          (w[2], w[2])]),
        level("Up2+Up_conv2", 224, 0, 0, [(w[2], w[1]), (2 * w[1], w[1]),
                                          (w[1], w[1])]),
    ]
    # 1x1 head: M x K=32 x N=4
    m = B_EFF * SIZE * SIZE
    levels.append({"name": "Deconv_1x1", "h": 224,
                   "real": 3 * 2 * m * w[1] * NUM_CLASSES,
                   "padded": 3 * 2 * m * 128 * 128,
                   "io": 3 * 2 * m * (w[1] + NUM_CLASSES)})

    print(f"{'level':>14} {'GFLOP':>8} {'padGF':>8} {'MB':>7} "
          f"{'t_mxu':>7} {'t_hbm':>7} {'floor':>7}")
    tot_r = tot_p = tot_io = tot_floor = tot_mxu = tot_hbm = 0.0
    for lv in levels:
        t_mxu = lv["padded"] / PEAK_BF16 * 1e3
        t_hbm = lv["io"] / HBM_BW * 1e3
        fl = max(t_mxu, t_hbm)
        tot_r += lv["real"]; tot_p += lv["padded"]; tot_io += lv["io"]
        tot_mxu += t_mxu; tot_hbm += t_hbm; tot_floor += fl
        print(f"{lv['name']:>14} {lv['real']/1e9:8.1f} {lv['padded']/1e9:8.1f} "
              f"{lv['io']/1e6:7.1f} {t_mxu:7.3f} {t_hbm:7.3f} {fl:7.3f}")
    print(f"{'TOTAL':>14} {tot_r/1e9:8.1f} {tot_p/1e9:8.1f} {tot_io/1e6:7.1f} "
          f"{tot_mxu:7.3f} {tot_hbm:7.3f} {tot_floor:7.3f}")
    print()
    print(f"real FLOPs/step:   {tot_r/1e12:.3f} TFLOP "
          f"(measured anchor: 1.148)")
    print(f"ideal-MFU time:    {tot_r/PEAK_BF16*1e3:.2f} ms "
          f"(100% MFU on real FLOPs)")
    print(f"conv floor:        {tot_floor:.2f} ms (padded-MXU vs HBM, "
          f"per-level max)")

    # ---- non-conv, bandwidth-bound step components (bytes -> ms) ----
    px = SIZE * SIZE
    params = 0
    for ci, co in [(1, w[1]), (w[1], w[1]), (w[1], w[2]), (w[2], w[2]),
                   (w[2], w[3]), (w[3], w[3]), (w[3], w[4]), (w[4], w[4]),
                   (w[4], w[5]), (w[5], w[5]),
                   (w[5], w[4]), (2 * w[4], w[4]), (w[4], w[4]),
                   (w[4], w[3]), (2 * w[3], w[3]), (w[3], w[3]),
                   (w[3], w[2]), (2 * w[2], w[2]), (w[2], w[2]),
                   (w[2], w[1]), (2 * w[1], w[1]), (w[1], w[1])]:
        params += 9 * ci * co
    params += w[1] * NUM_CLASSES
    extras = {
        # dW: contracts the same patches (counted in the 3x flops above);
        # extra IO = grads written once, f32: ~params * 4B
        "grad write + fused RAdam (7x f32 param-size arrays)":
            7 * params * 4,
        # affine warp of 5 unlabeled images (u8-epoch-free: gather 1ch f32
        # in + out) + inverse warp of the consistency logits (4ch)
        "warps (5 img + 5 logit maps, r+w)":
            2 * (5 * px * (1 + NUM_CLASSES) * 4),
        # losses: sup CE+dice on 5 labeled logits, consistency MSE on 5
        "losses (read 15 f32 logit maps)":
            15 * px * NUM_CLASSES * 4,
        # BN stats partials + affine params: negligible, listed for honesty
        "BN partials/affines": 64 * 2 * 2 * 4 * 30,
    }
    print()
    extra_ms = 0.0
    for name, bts in extras.items():
        ms = bts / HBM_BW * 1e3
        extra_ms += ms
        print(f"  +{ms:6.3f} ms  {name}  ({bts/1e6:.1f} MB)")
    total_floor = tot_floor + extra_ms
    print(f"\nstep floor (convs + step glue): {total_floor:.2f} ms")
    print(f"slices/s at floor (10 counted slices/step): "
          f"{10 * 1e3 / total_floor:.0f}")
    print(f"params: {params/1e6:.1f} M")


if __name__ == "__main__":
    main()
