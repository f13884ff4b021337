from dpfx.compat.convert import (
    DEFAULT_RULES,
    convert_state_dict,
    load_rules_file,
    load_torch_checkpoint,
    save_as_orbax,
    verify_against_template,
)

__all__ = [
    "DEFAULT_RULES",
    "convert_state_dict",
    "load_rules_file",
    "load_torch_checkpoint",
    "save_as_orbax",
    "verify_against_template",
]
