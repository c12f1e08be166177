"""Auto-generate a commented YAML config template from the schema.

Counterpart of the reference's template generator
(sbayes/config/generate_template.py): walks the pydantic models, harvests
the per-field docstrings from the schema source via ``ast`` introspection
and emits a commented ``config_template.yaml`` with defaults.
"""
from __future__ import annotations

import ast
import inspect
from enum import Enum
from pathlib import Path
from typing import Union, get_args, get_origin

from pydantic_core import PydanticUndefined

from sbayes_tpu.config import schema
from sbayes_tpu.config.schema import BaseConfig, SBayesConfig


def harvest_attr_docs() -> dict:
    """{class_name: {field: docstring}} from the schema source."""
    src = inspect.getsource(schema)
    tree = ast.parse(src)
    docs: dict = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        class_docs: dict = {}
        body = node.body
        for i, stmt in enumerate(body):
            if isinstance(stmt, (ast.AnnAssign, ast.Assign)) and i + 1 < len(body):
                nxt = body[i + 1]
                if (
                    isinstance(nxt, ast.Expr)
                    and isinstance(nxt.value, ast.Constant)
                    and isinstance(nxt.value.value, str)
                ):
                    if isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
                        class_docs[stmt.target.id] = " ".join(nxt.value.value.split())
        docs[node.name] = class_docs
    return docs


def _default_repr(value):
    if value is PydanticUndefined:
        return "<REQUIRED>"
    if value is None:
        return "null"
    if isinstance(value, Enum):
        return value.value
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, Path):
        return str(value)
    return value


def _is_config_model(tp) -> bool:
    return isinstance(tp, type) and issubclass(tp, BaseConfig)


def generate_template_lines(model: type, docs: dict, indent: int = 0) -> list:
    lines = []
    pad = "  " * indent
    class_doc_chain = [c.__name__ for c in model.__mro__ if _is_config_model(c)]
    for name, field in model.model_fields.items():
        doc = None
        for cls_name in class_doc_chain:
            doc = docs.get(cls_name, {}).get(name)
            if doc:
                break

        annotation = field.annotation
        origin = get_origin(annotation)
        if origin is Union:
            args = [a for a in get_args(annotation) if a is not type(None)]
            annotation = args[0] if args else annotation

        if _is_config_model(annotation):
            if doc:
                lines.append(f"{pad}# {doc}")
            lines.append(f"{pad}{name}:")
            if field.default_factory is not None or field.default is not PydanticUndefined:
                lines.extend(generate_template_lines(annotation, docs, indent + 1))
            else:
                lines.extend(generate_template_lines(annotation, docs, indent + 1))
        elif origin is dict or annotation is dict:
            if doc:
                lines.append(f"{pad}# {doc}")
            lines.append(f"{pad}{name}: {{}}")
        else:
            default = field.default
            if field.default_factory is not None:
                try:
                    default = field.default_factory()
                except TypeError:
                    default = None
            if doc:
                lines.append(f"{pad}# {doc}")
            lines.append(f"{pad}{name}: {_default_repr(default)}")
    return lines


def generate_template() -> str:
    docs = harvest_attr_docs()
    header = (
        "# Auto-generated configuration template for sbayes_tpu.\n"
        "# Fields marked <REQUIRED> must be provided; all others show their defaults.\n"
    )
    return header + "\n".join(generate_template_lines(SBayesConfig, docs)) + "\n"


def main(args=None):
    import argparse

    parser = argparse.ArgumentParser(description="Generate a commented YAML config template.")
    parser.add_argument("--output", type=Path, default=Path("config_template.yaml"))
    ns = parser.parse_args(args)
    ns.output.write_text(generate_template())
    print(f"Template written to {ns.output}")


if __name__ == "__main__":
    main()
