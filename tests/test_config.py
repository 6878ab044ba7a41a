"""Config merge tests: layering, null-clears, dict merge."""

from biocypher_spark.config import DEFAULTS, read_config


def test_defaults(tmp_path):
    cfg = read_config(user_config_file=str(tmp_path / "nope.yaml"), local_config_file=str(tmp_path / "nope2.yaml"))
    assert cfg["biocypher"]["dbms"] == "neo4j"
    assert cfg["neo4j"]["delimiter"] == ";"


def test_null_clears_and_merge(tmp_path):
    user = tmp_path / "user.yaml"
    user.write_text("biocypher:\n  strict_mode: true\nneo4j:\n  wipe: null\n")
    local = tmp_path / "local.yaml"
    local.write_text("biocypher:\n  strict_mode: false\n  output_directory: /data/out\n")
    cfg = read_config(user_config_file=str(user), local_config_file=str(local))
    # local wins over user
    assert cfg["biocypher"]["strict_mode"] is False
    assert cfg["biocypher"]["output_directory"] == "/data/out"
    # explicit null clears the default
    assert cfg["neo4j"]["wipe"] is None
    # untouched keys keep defaults
    assert cfg["neo4j"]["delimiter"] == ";"
    # defaults dict itself not mutated
    assert DEFAULTS["neo4j"]["wipe"] is True


def test_toplevel_null(tmp_path):
    user = tmp_path / "user.yaml"
    user.write_text("spark: null\n")
    cfg = read_config(user_config_file=str(user), local_config_file=str(tmp_path / "n.yaml"))
    assert cfg["spark"] is None
