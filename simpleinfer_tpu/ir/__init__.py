"""pnnx model-format IR: graph dataclasses, param/bin parser, rewrite passes."""
from .dtypes import (
    numpy_to_type,
    string_to_type,
    type_to_elemsize,
    type_to_numpy,
    type_to_string,
)
from .expression import expand_expression
from .graph import Attribute, Graph, Operand, Operator, Parameter
from .storezip import StoreZipReader, StoreZipWriter

__all__ = [
    "Attribute",
    "Graph",
    "Operand",
    "Operator",
    "Parameter",
    "StoreZipReader",
    "StoreZipWriter",
    "expand_expression",
    "numpy_to_type",
    "string_to_type",
    "type_to_elemsize",
    "type_to_numpy",
    "type_to_string",
]
