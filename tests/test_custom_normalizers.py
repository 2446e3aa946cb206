"""Custom-normalizer registry round-trips.

Ports the intent of the reference's custom-normalizer coverage
(python/tests/unit/arcticdb/version_store/test_recursive_normalizers.py
AlmostAList/CustomArray cases; registry from
python/arcticdb/version_store/_custom_normalizers.py) against this
engine's registry: register -> write translates the custom type into the
native machinery (frame / recursive structure / pickle) -> read rebuilds
the original type.
"""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark import (CustomNormalizer, CustomNormalizerMeta,
                            clear_registered_normalizers, register_normalizer,
                            registered_normalizers)
from arcticdb_spark.catalog import ArcticException


class AlmostAList(list):
    pass


class AlmostAListNormalizer(CustomNormalizer):
    # reference test_recursive_normalizers.py AlmostAListNormalizer
    def normalize(self, item, **kwargs):
        if not isinstance(item, AlmostAList):
            return None
        return list(item), CustomNormalizerMeta()

    def denormalize(self, item, norm_meta):
        return AlmostAList(item)


class CustomArray:
    # reference util/test.py CustomArray/CustomArrayNormalizer
    def __init__(self, x, y, z):
        self._x, self._y, self._z = x, y, z

    def __eq__(self, other):
        return (isinstance(other, CustomArray) and self._x == other._x
                and self._y == other._y and self._z == other._z)


class CustomArrayNormalizer(CustomNormalizer):
    def normalize(self, item, **kwargs):
        if not isinstance(item, CustomArray):
            return None
        return [item._x, item._y, item._z], CustomNormalizerMeta()

    def denormalize(self, item, norm_meta):
        return CustomArray(*item)


class FrameBox:
    """A custom type normalizing to a DataFrame (TimeFrame-like), with
    payload meta carried through CustomNormalizerMeta.data."""

    def __init__(self, name, frame):
        self.name = name
        self.frame = frame


class FrameBoxNormalizer(CustomNormalizer):
    def normalize(self, item, **kwargs):
        if not isinstance(item, FrameBox):
            return None
        return item.frame, CustomNormalizerMeta({"name": item.name})

    def denormalize(self, item, norm_meta):
        return FrameBox(norm_meta.data["name"], item)


@pytest.fixture(autouse=True)
def _clean_registry():
    clear_registered_normalizers()
    yield
    clear_registered_normalizers()


def test_almost_a_list_roundtrip(tmp_lib):
    register_normalizer(AlmostAListNormalizer())
    data = AlmostAList([1, 2, 3])
    tmp_lib.write("al", data)
    back = tmp_lib.read("al")
    assert isinstance(back, AlmostAList)
    assert list(back) == [1, 2, 3]


def test_custom_leaf_inside_recursive_structure(tmp_lib):
    # reference test_custom_normalizer: dict with ndarray, nested frame,
    # custom leaf and a pickled leaf
    register_normalizer(CustomArrayNormalizer())
    data = {"a": np.arange(5),
            "b": {"c": pd.DataFrame({"col": [1, 2, 3]})},
            "d": CustomArray(100, 1000, 10),
            "e": [{"weird": object}]}
    tmp_lib.write("sym", data, recursive_normalizers=True)
    back = tmp_lib.read("sym", output_format="pandas")
    assert np.array_equal(back["a"], np.arange(5))
    pd.testing.assert_frame_equal(back["b"]["c"],
                                  pd.DataFrame({"col": [1, 2, 3]}))
    assert back["d"] == CustomArray(100, 1000, 10)
    assert back["e"][0]["weird"] is object


def test_frame_backed_custom_type_with_meta(tmp_lib):
    register_normalizer(FrameBoxNormalizer())
    idx = pd.date_range("2024-01-01", periods=4, freq="1h")
    fb = FrameBox("prices", pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]},
                                         index=idx))
    tmp_lib.write("fb", fb)
    back = tmp_lib.read("fb")
    assert isinstance(back, FrameBox)
    assert back.name == "prices"
    pd.testing.assert_frame_equal(back.frame, fb.frame, check_freq=False)
    # queries on custom-normalized symbols are rejected (opaque, like
    # pickled symbols)
    with pytest.raises(ArcticException):
        tmp_lib.read("fb", date_range=(idx[0], idx[1]))


def test_unregistered_on_read_raises(tmp_lib):
    register_normalizer(AlmostAListNormalizer())
    tmp_lib.write("al", AlmostAList([7]))
    clear_registered_normalizers()
    with pytest.raises(LookupError, match="register_normalizer"):
        tmp_lib.read("al")


def test_registry_priority_and_duplicates():
    class N1(AlmostAListNormalizer):
        pass

    class N2(AlmostAListNormalizer):
        pass

    a, b = N1(), N2()
    register_normalizer(a, priority=20.0)
    register_normalizer(b, priority=5.0)
    assert registered_normalizers() == [b, a]  # lowest priority first
    assert register_normalizer(N1()) is False  # duplicate class rejected


def test_versioning_and_pickle_probe(tmp_lib):
    register_normalizer(AlmostAListNormalizer())
    tmp_lib.write("al", AlmostAList([1]))
    tmp_lib.write("al", AlmostAList([1, 2]))
    assert list(tmp_lib.read("al", as_of=0)) == [1]
    assert list(tmp_lib.read("al")) == [1, 2]
    # normalized output is a nested structure of pickled int leaves
    assert tmp_lib.will_item_be_pickled(AlmostAList([1])) is True
    register_normalizer(FrameBoxNormalizer())
    fb = FrameBox("x", pd.DataFrame({"v": [1.0]}))
    assert tmp_lib.will_item_be_pickled(fb) is False
