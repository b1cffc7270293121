import math

import numpy as np
import pytest

from contrastyou_tpu.meters import (AverageValueDictionaryMeter, AverageValueMeter,
                                    MeterInterface, Storage, SurfaceMeter,
                                    UniversalDice)


def test_average_meter():
    m = AverageValueMeter()
    m.add(1.0)
    m.add(3.0)
    assert m.summary() == 2.0
    m.reset()
    assert math.isnan(m.summary())


def test_average_meter_weighted():
    m = AverageValueMeter()
    m.add(1.0, n=3)
    m.add(5.0, n=1)
    assert m.summary() == 2.0


def test_average_dict_meter():
    m = AverageValueDictionaryMeter()
    m.add(a=1.0, b=2.0)
    m.add(a=3.0)
    s = m.summary()
    assert s["a"] == 2.0 and s["b"] == 2.0


def test_universal_dice_perfect():
    m = UniversalDice(C=3, report_axis=[1, 2])
    target = np.zeros((4, 8, 8), np.int32)
    target[:, :4] = 1
    target[:, 4:, :4] = 2
    m.add(target, target, group_name=["s0", "s0", "s1", "s1"])
    s = m.summary()
    assert s["DSC1"] == pytest.approx(1.0)
    assert s["DSC2"] == pytest.approx(1.0)
    assert s["DSC_mean"] == pytest.approx(1.0)
    assert m.group_names == ["s0", "s1"]


def test_universal_dice_volume_vs_slice():
    """Per-group accumulation must yield VOLUME dice, not mean of slice dices."""
    # scan with 2 slices: slice0 pred misses everything, slice1 perfect
    target = np.zeros((2, 4, 4), np.int32)
    target[:, :2] = 1
    pred = target.copy()
    pred[0] = 0  # slice 0 all background
    m = UniversalDice(C=2, report_axis=[1])
    m.add(pred, target, group_name=["v", "v"])
    # volume: inter=8, |pred|=8, |target|=16 -> dice = 2*8/(8+16) = 2/3
    assert m.summary()["DSC1"] == pytest.approx(2 / 3, abs=1e-6)


def test_universal_dice_mask():
    target = np.ones((2, 4, 4), np.int32)
    pred = target.copy()
    pred[1] = 0  # garbage in padded slot
    m = UniversalDice(C=2, report_axis=[1])
    m.add(pred, target, group_name=["a", "a"], mask=np.array([True, False]))
    assert m.summary()["DSC1"] == pytest.approx(1.0)


def test_surface_meter_asd_zero_for_identical():
    m = SurfaceMeter(C=2, report_axis=[1], metername="asd")
    vol = np.zeros((3, 16, 16), np.int32)
    vol[:, 4:12, 4:12] = 1
    m.add(vol, vol, group_name=["s", "s", "s"])
    assert m.summary()["ASD1"] == pytest.approx(0.0)


def test_surface_meter_hd_shifted():
    m = SurfaceMeter(C=2, report_axis=[1], metername="hausdorff")
    a = np.zeros((1, 16, 16), np.int32)
    b = np.zeros((1, 16, 16), np.int32)
    a[0, 4:8, 4:8] = 1
    b[0, 6:10, 4:8] = 1  # shifted by 2 rows
    m.add(a, b, group_name=["s"])
    assert m.summary()["HD1"] == pytest.approx(2.0)


def test_meter_interface_focus_namespacing():
    mi = MeterInterface(default_focus="tra")
    mi.register_meter("loss", AverageValueMeter())
    with mi.focus_on("hookA"):
        mi.register_meter("loss", AverageValueMeter())
        mi.add("loss", 5.0)
    mi.add("loss", 1.0)
    stats = dict(mi.statistics())
    assert stats["tra"]["loss"] == 1.0
    assert stats["hookA"]["loss"] == 5.0


def test_meter_interface_duplicate_raises():
    mi = MeterInterface()
    mi.register_meter("loss", AverageValueMeter())
    with pytest.raises(KeyError):
        mi.register_meter("loss", AverageValueMeter())


def test_meter_interface_hidden_groups():
    mi = MeterInterface()
    with mi.focus_on("_hidden"):
        mi.register_meter("x", AverageValueMeter())
    assert dict(mi.statistics()) == {}


def test_storage_roundtrip(tmp_path):
    st = Storage(tmp_path)
    st.add_from_meter_interface(epoch=0, tra={"tra": {"loss": 1.0}},
                                val={"val": {"dice": {"DSC_mean": 0.5}}})
    st.add_from_meter_interface(epoch=1, tra={"tra": {"loss": 0.5}},
                                val={"val": {"dice": {"DSC_mean": 0.7}}})
    st.to_csv()
    assert (tmp_path / "storage.csv").exists()
    df = st.summary()
    assert df.shape[0] == 2
    # state roundtrip
    st2 = Storage(tmp_path)
    st2.load_state_dict(st.state_dict())
    assert st2.summary().equals(df)
