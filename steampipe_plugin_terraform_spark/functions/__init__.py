from .jsonenc import canonical_json, convert_expression_value

__all__ = ["canonical_json", "convert_expression_value"]
