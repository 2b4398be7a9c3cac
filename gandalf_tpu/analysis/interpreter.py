"""Interactive command interpreter (reference
analysis/gandalf_interpreter.py): a cmd-based REPL that wraps every
public facade function, so `gandalf_tpu interpreter` gives the same
newsim/run/plot workflow as the reference CLI."""

from __future__ import annotations

import cmd
import shlex

from . import compute, facade


def _public_callables():
    out = {}
    for mod in (facade, compute):
        for name in dir(mod):
            if name.startswith("_"):
                continue
            fn = getattr(mod, name)
            if callable(fn) and not isinstance(fn, type):
                out.setdefault(name, fn)
    return out


class GandalfInterpreter(cmd.Cmd):
    intro = ("gandalf_tpu interactive interpreter. "
             "Type help or ? to list commands; quit to exit.")
    prompt = "gandalf_tpu> "

    def __init__(self):
        super().__init__()
        self._fns = _public_callables()

    def default(self, line: str):
        parts = shlex.split(line)
        if not parts:
            return False
        name, args = parts[0], parts[1:]
        if name in ("quit", "exit", "EOF"):
            return True
        fn = self._fns.get(name)
        if fn is None:
            print(f"unknown command: {name!r} (try 'help')")
            return False
        conv = []
        for a in args:
            try:
                conv.append(int(a))
            except ValueError:
                try:
                    conv.append(float(a))
                except ValueError:
                    conv.append(a)
        try:
            out = fn(*conv)
            if out is not None:
                print(out)
        except Exception as e:        # surface errors, keep the REPL alive
            print(f"error: {e}")
        return False

    def do_help(self, arg):
        if arg and arg in self._fns:
            print(self._fns[arg].__doc__ or "(no docstring)")
        else:
            names = sorted(self._fns)
            print("commands:", ", ".join(names))

    do_EOF = default


def main():
    GandalfInterpreter().cmdloop()


if __name__ == "__main__":
    main()
