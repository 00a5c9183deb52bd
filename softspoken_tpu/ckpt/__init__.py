from .convert import (
    convert_torch_state_dict,
    export_pth,
    fixture_state_dict,
    fixture_variables,
    flax_to_torch_state_dict,
    load,
    load_any,
    load_pth,
    save,
)

__all__ = [
    "convert_torch_state_dict",
    "export_pth",
    "fixture_state_dict",
    "fixture_variables",
    "flax_to_torch_state_dict",
    "load",
    "load_any",
    "load_pth",
    "save",
]
