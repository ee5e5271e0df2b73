from fireflies_tpu.entity.mesh import Mesh
from fireflies_tpu.entity.shape_model import FlameShapeModel, ShapeModel
from fireflies_tpu.entity.transformable import Curve, Transformable

__all__ = ["Transformable", "Mesh", "Curve", "ShapeModel", "FlameShapeModel"]
