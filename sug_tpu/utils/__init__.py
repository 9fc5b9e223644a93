from sug_tpu.utils.config import (
    ConfigDict,
    cfg,
    parser_config,
    cfg_from_yaml_file,
    cfg_from_list,
    merge_new_config,
    log_config_to_file,
)
from sug_tpu.utils.logging import create_logger, exp_log_folder_creator, MetricsWriter

__all__ = [
    "ConfigDict",
    "cfg",
    "parser_config",
    "cfg_from_yaml_file",
    "cfg_from_list",
    "merge_new_config",
    "log_config_to_file",
    "create_logger",
    "exp_log_folder_creator",
    "MetricsWriter",
]
