from genima_tpu.weights.torch_port import (  # noqa: F401
    export_torch_state_dict,
    load_torch_file,
    port_torch_state_dict,
)
