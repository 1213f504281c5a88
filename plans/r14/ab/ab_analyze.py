import json, glob, statistics
def load(tree):
    runs=[]
    for f in sorted(glob.glob(f"/tmp/ab_{tree}_r*.json")):
        try:
            j=json.loads(open(f).read().strip())
            runs.append(j)
        except Exception as e:
            print("skip",f,e)
    return runs
r13,r14=load("r13tree"),load("repo")
print(f"runs: r13={len(r13)} r14={len(r14)}")
for lbl,runs in (("r13",r13),("r14",r14)):
    for j in runs:
        c=j.get("controls",{})
        print(lbl,"total",j["value"],"ctl",c.get("start"),c.get("end"))
def mins(runs):
    out={}
    for j in runs:
        for q,v in j["queries"].items():
            out[q]=min(out.get(q,1e9),v)
    return out
m13,m14=mins(r13),mins(r14)
rows=[]
for q in m13:
    if q in m14: rows.append((m14[q]/m13[q],q,m13[q],m14[q]))
rows.sort()
tot13=sum(m13[q] for q in m13 if q in m14); tot14=sum(m14[q] for q in m13 if q in m14)
print(f"\nheadline min-sum: r13={tot13:.2f}s r14={tot14:.2f}s ratio={tot14/tot13:.3f}")
for r,q,a,b in rows: print(f"  {r:5.2f}  {q:32s} {a:6.3f} -> {b:6.3f}")
