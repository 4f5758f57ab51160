"""Executable <test> scenes — the reference's validation suite, run for real.

Each case loads a REFERENCE XML (scenes/pa3,pa4/tests) through the repo's
parser and executes the statistical test, mirroring `nori scene_with_test.xml`
(ttest.cpp:81-95, chi2test.cpp:76-89). Sample counts are scaled down for CI;
the CLI `test` subcommand runs them at full scale.
"""

import pytest

from optix_renderer_tpu.validation import run_xml_test

REF = "/root/reference/scenes"


@pytest.mark.parametrize(
    "xml,scale",
    [
        (f"{REF}/pa3/tests/ttest-microfacet.xml", 0.5),
        (f"{REF}/pa4/tests/test-direct.xml", 0.2),
        (f"{REF}/pa4/tests/test-furnace.xml", 0.2),
        (f"{REF}/pa3/tests/test-mesh-furnace.xml", 0.2),
        (f"{REF}/pa3/tests/test-mesh.xml", 0.2),
    ],
)
def test_reference_ttest_scenes(xml, scale):
    report = run_xml_test(xml, verbose=False, sample_scale=scale)
    assert report.ok, "\n".join(report.messages)


def test_reference_chi2_microfacet():
    report = run_xml_test(
        f"{REF}/pa3/tests/chi2test-microfacet.xml", verbose=False, sample_scale=0.1
    )
    assert report.ok, "\n".join(report.messages)


def test_unknown_test_type_raises(tmp_path):
    f = tmp_path / "bad.xml"
    f.write_text('<test type="nosuch"/>')
    with pytest.raises(ValueError):
        run_xml_test(f, verbose=False)


def test_render_cli_dispatches_test_root(tmp_path, capsys):
    """`render foo.xml` on a <test> root must EXECUTE the test (the round-1
    silent-normals-render bug, VERDICT M4)."""
    from optix_renderer_tpu import cli

    rc = cli.main(
        ["render", f"{REF}/pa3/tests/ttest-microfacet.xml"]
    )
    out = capsys.readouterr().out
    assert "Passed" in out and "ttest" in out
    assert rc == 0
