from mmr_tpu.config.config import (  # noqa: F401
    get_default_config,
    get_config,
    create_config,
    add_user_config_args,
    check_and_convert_user_config_args,
    safe_eval,
)
