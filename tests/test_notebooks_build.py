"""The notebook deliverables must keep building (scripts.make_notebooks)."""

import nbformat


def test_notebooks_build(tmp_path, monkeypatch):
    from scripts import make_notebooks as mn

    monkeypatch.setattr(mn, "OUT", tmp_path)
    for name, cells in mn.NOTEBOOKS.items():
        p = mn.build(name, cells)
        nb = nbformat.read(p, as_version=4)
        assert len(nb.cells) >= 4, name
        kinds = {c.cell_type for c in nb.cells}
        assert kinds == {"markdown", "code"}, name
        # every code cell must be syntactically valid python
        import ast

        for c in nb.cells:
            if c.cell_type == "code":
                ast.parse(c.source)
