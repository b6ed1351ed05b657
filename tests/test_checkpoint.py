"""Checkpoint round-trip tests (reference: checkpoint_test.py:67)."""

import dataclasses
import io
from typing import Any, Optional, Union

import numpy as np

from graphcast_tpu import checkpoint
from graphcast_tpu.models import configs


@dataclasses.dataclass(frozen=True)
class SubConfig:
  a: int
  b: str
  c: tuple[int, ...]
  d: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class Nested:
  params: dict[str, Any]
  sub: SubConfig
  items: list[int]
  pair: tuple[int, str]
  maybe: Optional[SubConfig]
  name: str


def test_roundtrip_nested_dataclass():
  value = Nested(
      params={"layer": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                        "b": np.zeros(3)}},
      sub=SubConfig(a=3, b="hello", c=(1, 2, 3), d=2.5),
      items=[1, 2, 3],
      pair=(7, "x"),
      maybe=None,
      name="ckpt")
  buf = io.BytesIO()
  checkpoint.dump(buf, value)
  buf.seek(0)
  out = checkpoint.load(buf, Nested)
  assert out.sub == value.sub
  assert out.items == [1, 2, 3]
  assert out.pair == (7, "x")
  assert out.maybe is None
  assert out.name == "ckpt"
  np.testing.assert_array_equal(out.params["layer"]["w"],
                                value.params["layer"]["w"])


def test_roundtrip_graphcast_checkpoint_schema(tmp_path):
  ckpt = configs.CheckPoint(
      params={"grid2mesh_gnn": {
          "encoder_nodes_grid_nodes": {
              "mlp": {"linear_0": {
                  "w": np.ones((4, 8), np.float32),
                  "b": np.zeros(8, np.float32)}}}}},
      model_config=configs.ModelConfig(
          resolution=1.0, mesh_size=5, latent_size=256, gnn_msg_steps=8,
          hidden_layers=1, radius_query_fraction_edge_length=0.6,
          mesh2grid_edge_normalization_factor=None),
      task_config=configs.TASK_13,
      description="test checkpoint",
      license="apache-2.0")
  path = str(tmp_path / "ckpt.npz")
  checkpoint.dump(path, ckpt)
  out = checkpoint.load(path, configs.CheckPoint)
  assert out.model_config == ckpt.model_config
  assert out.task_config == ckpt.task_config
  assert out.description == "test checkpoint"
  w = out.params["grid2mesh_gnn"]["encoder_nodes_grid_nodes"]["mlp"][
      "linear_0"]["w"]
  np.testing.assert_array_equal(w, np.ones((4, 8), np.float32))


def test_optional_with_value():
  @dataclasses.dataclass
  class D:
    x: Optional[float]

  buf = io.BytesIO()
  checkpoint.dump(buf, D(x=1.5))
  buf.seek(0)
  assert checkpoint.load(buf, D).x == 1.5
