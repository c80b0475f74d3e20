"""YAML-driven workflows (topo, accuracy) exposed through the CLI."""

from xdem_tpu.workflows.accuracy import Accuracy
from xdem_tpu.workflows.topo import Topo
from xdem_tpu.workflows.workflows import Workflows, load_yaml_config

__all__ = ["Workflows", "Topo", "Accuracy", "load_yaml_config"]
