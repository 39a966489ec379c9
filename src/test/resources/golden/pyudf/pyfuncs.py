# Re-authored python UDF fixture exposing the same function surface the
# reference's python test scripts declare (names + semantics from
# tajo-core-tests TestPythonFunctions / TestSelectQuery
# testNestedPythonFunction; implementations are this repo's own).
from tajo_util import output_type


@output_type('int4')
def return_one():
    return 1


@output_type('text')
def helloworld():
    return 'Hello, World'


# undecorated: registers as BLOB, the reference's default return type
def concat_py(s):
    if s is None:
        return None
    return s + s


@output_type('int4')
def add_py(a, b):
    if a is None or b is None:
        return None
    return a + b


@output_type('float8')
def percent(num, total):
    return num * 100 / float(total)


@output_type('text')
def comma_format(num):
    return format(num, ',')


@output_type('text')
def concat4(w1, w2, w3, w4):
    return ' '.join([w1, w2, w3, w4])


class AvgPy:
    def __init__(self):
        self.s = 0
        self.n = 0

    def eval(self, x):
        if x is not None:
            self.s += x
            self.n += 1

    def get_partial_result(self):
        return [self.s, self.n]

    def merge(self, p):
        if p:
            self.s += p[0]
            self.n += p[1]

    @output_type('float8')
    def get_final_result(self):
        if self.n == 0:
            return None
        return self.s / float(self.n)
