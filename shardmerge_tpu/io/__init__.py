from .safetensors_io import (  # noqa: F401
    SafeTensorsReader,
    load_file,
    read_header,
    save_file,
)
