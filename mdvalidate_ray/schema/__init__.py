from mdvalidate_ray.schema.spec import CompiledSchema, SchemaError
from mdvalidate_ray.schema.compiler import compile_schema

__all__ = ["CompiledSchema", "SchemaError", "compile_schema"]
