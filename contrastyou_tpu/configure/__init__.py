from .config import (Config, ConfigParser, dictionary_merge_by_hierachy,
                     extract_params_with_key_prefix, get_config, register_config,
                     yaml_load, yaml_write)

__all__ = ["Config", "ConfigParser", "dictionary_merge_by_hierachy",
           "extract_params_with_key_prefix", "get_config", "register_config",
           "yaml_load", "yaml_write"]
