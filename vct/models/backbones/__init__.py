"""Backbone registry — string-keyed like the reference's
``getattr(torchvision.models, name)`` dispatch (``models.py:133``)."""

from __future__ import annotations

import jax.numpy as jnp

from vct.core.registry import Registry
from vct.models.backbones.densenet import densenet121
from vct.models.backbones.efficientnet import efficientnet_b0
from vct.models.backbones.inception import inception_v3
from vct.models.backbones.mobilenet import mobilenet_v2
from vct.models.backbones.resnet import (
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from vct.models.backbones.vgg import alexnet, vgg16

BACKBONES = Registry("backbone")
for _name, _factory in [
    ("resnet18", resnet18),
    ("resnet34", resnet34),
    ("resnet50", resnet50),
    ("resnet101", resnet101),
    ("resnet152", resnet152),
    ("mobilenet_v2", mobilenet_v2),
    ("densenet121", densenet121),
    ("vgg16", vgg16),
    ("alexnet", alexnet),
    ("efficientnet_b0", efficientnet_b0),
    ("inception_v3", inception_v3),
]:
    BACKBONES.register(_name, _factory)


def build_backbone(name: str, dtype=jnp.float32, module_name: str | None = None):
    """Instantiate a backbone module by name; returns (module, feature_dim).

    Must be called from within a parent module's ``setup``/``compact`` context
    when ``module_name`` is given (the instance binds to that parent).
    """
    module = BACKBONES.get(name)(dtype=dtype, name=module_name)
    return module, module.feature_dim
