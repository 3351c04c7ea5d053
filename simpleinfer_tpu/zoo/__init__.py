"""Model zoo: synthetic pnnx model builders + detection/classify demos.

The reference ships its model fixtures as an out-of-repo git submodule of
pre-exported .pnnx.param/.bin files (yolov5s/n, mobilenet, resnet —
SURVEY.md §1.6) which is not available here; instead the zoo *builds*
those architectures directly as pnnx graphs (ir.Graph) with seeded random
weights, exercising the exact same op surface. `Graph.save` writes them
to real .pnnx.param/.bin files when on-disk fixtures are wanted.
"""
from .builders import (
    build_bert,
    build_bloom,
    build_gpt,
    build_llama,
    build_neox,
    build_convnext,
    build_densenet,
    build_mobilenet_like,
    build_mobilenet_v3_like,
    build_resnet18,
    build_resnet50,
    build_squeezenet,
    build_unet,
    build_vit,
    build_yolov5,
    build_yolov8,
)
from .generate import greedy_generate

__all__ = ["build_bert", "build_bloom", "build_gpt", "build_llama", "build_neox", "greedy_generate", "build_convnext", "build_densenet", "build_mobilenet_like", "build_mobilenet_v3_like",
           "build_resnet18", "build_resnet50", "build_squeezenet", "build_unet", "build_vit",
           "build_yolov5", "build_yolov8"]
