from pnpflow_tpu.utils.config import (
    CfgNode,
    load_cfg_from_cfg_file,
    merge_cfg_from_list,
    load_full_config,
)
