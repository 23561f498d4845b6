from vllm_main_modify_tpu.kv_transfer.connector import (  # noqa: F401
    KVTransferConfig, create_kv_connector)
