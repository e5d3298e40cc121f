NAME          ASSIGN92
ROWS
 N  OBJ
 E  R0
 E  R1
 E  R2
 E  R3
 E  R4
 E  R5
 E  R6
 E  R7
 E  R8
 E  R9
 E  R10
 E  R11
 E  R12
 E  R13
 E  R14
 E  R15
 E  R16
 E  R17
 E  R18
 E  R19
 E  R20
 E  R21
 E  R22
 E  R23
 E  R24
 E  R25
 E  R26
 E  R27
 E  R28
 E  R29
 E  R30
 E  R31
 E  R32
 E  R33
 E  R34
 E  R35
COLUMNS
    X0  R0  1.0
    X0  R18  1.0
    X0  OBJ  23.0
    X1  R0  1.0
    X1  R19  1.0
    X1  OBJ  30.0
    X2  R0  1.0
    X2  R20  1.0
    X2  OBJ  48.0
    X3  R0  1.0
    X3  R21  1.0
    X3  OBJ  4.0
    X4  R0  1.0
    X4  R22  1.0
    X4  OBJ  25.0
    X5  R0  1.0
    X5  R23  1.0
    X5  OBJ  18.0
    X6  R0  1.0
    X6  R24  1.0
    X6  OBJ  20.0
    X7  R0  1.0
    X7  R25  1.0
    X7  OBJ  17.0
    X8  R0  1.0
    X8  R26  1.0
    X8  OBJ  31.0
    X9  R0  1.0
    X9  R27  1.0
    X9  OBJ  2.0
    X10  R0  1.0
    X10  R28  1.0
    X10  OBJ  34.0
    X11  R0  1.0
    X11  R29  1.0
    X11  OBJ  43.0
    X12  R0  1.0
    X12  R30  1.0
    X12  OBJ  13.0
    X13  R0  1.0
    X13  R31  1.0
    X13  OBJ  2.0
    X14  R0  1.0
    X14  R32  1.0
    X14  OBJ  32.0
    X15  R0  1.0
    X15  R33  1.0
    X15  OBJ  1.0
    X16  R0  1.0
    X16  R34  1.0
    X16  OBJ  25.0
    X17  R0  1.0
    X17  R35  1.0
    X17  OBJ  32.0
    X18  R1  1.0
    X18  R18  1.0
    X18  OBJ  1.0
    X19  R1  1.0
    X19  R19  1.0
    X19  OBJ  3.0
    X20  R1  1.0
    X20  R20  1.0
    X20  OBJ  14.0
    X21  R1  1.0
    X21  R21  1.0
    X21  OBJ  8.0
    X22  R1  1.0
    X22  R22  1.0
    X22  OBJ  18.0
    X23  R1  1.0
    X23  R23  1.0
    X23  OBJ  10.0
    X24  R1  1.0
    X24  R24  1.0
    X24  OBJ  40.0
    X25  R1  1.0
    X25  R25  1.0
    X25  OBJ  25.0
    X26  R1  1.0
    X26  R26  1.0
    X26  OBJ  29.0
    X27  R1  1.0
    X27  R27  1.0
    X27  OBJ  21.0
    X28  R1  1.0
    X28  R28  1.0
    X28  OBJ  38.0
    X29  R1  1.0
    X29  R29  1.0
    X29  OBJ  23.0
    X30  R1  1.0
    X30  R30  1.0
    X30  OBJ  44.0
    X31  R1  1.0
    X31  R31  1.0
    X31  OBJ  34.0
    X32  R1  1.0
    X32  R32  1.0
    X32  OBJ  11.0
    X33  R1  1.0
    X33  R33  1.0
    X33  OBJ  16.0
    X34  R1  1.0
    X34  R34  1.0
    X34  OBJ  49.0
    X35  R1  1.0
    X35  R35  1.0
    X35  OBJ  2.0
    X36  R2  1.0
    X36  R18  1.0
    X36  OBJ  8.0
    X37  R2  1.0
    X37  R19  1.0
    X37  OBJ  25.0
    X38  R2  1.0
    X38  R20  1.0
    X38  OBJ  32.0
    X39  R2  1.0
    X39  R21  1.0
    X39  OBJ  20.0
    X40  R2  1.0
    X40  R22  1.0
    X40  OBJ  2.0
    X41  R2  1.0
    X41  R23  1.0
    X41  OBJ  40.0
    X42  R2  1.0
    X42  R24  1.0
    X42  OBJ  4.0
    X43  R2  1.0
    X43  R25  1.0
    X43  OBJ  49.0
    X44  R2  1.0
    X44  R26  1.0
    X44  OBJ  37.0
    X45  R2  1.0
    X45  R27  1.0
    X45  OBJ  39.0
    X46  R2  1.0
    X46  R28  1.0
    X46  OBJ  14.0
    X47  R2  1.0
    X47  R29  1.0
    X47  OBJ  27.0
    X48  R2  1.0
    X48  R30  1.0
    X48  OBJ  23.0
    X49  R2  1.0
    X49  R31  1.0
    X49  OBJ  14.0
    X50  R2  1.0
    X50  R32  1.0
    X50  OBJ  37.0
    X51  R2  1.0
    X51  R33  1.0
    X51  OBJ  13.0
    X52  R2  1.0
    X52  R34  1.0
    X52  OBJ  13.0
    X53  R2  1.0
    X53  R35  1.0
    X53  OBJ  44.0
    X54  R3  1.0
    X54  R18  1.0
    X54  OBJ  16.0
    X55  R3  1.0
    X55  R19  1.0
    X55  OBJ  49.0
    X56  R3  1.0
    X56  R20  1.0
    X56  OBJ  27.0
    X57  R3  1.0
    X57  R21  1.0
    X57  OBJ  44.0
    X58  R3  1.0
    X58  R22  1.0
    X58  OBJ  27.0
    X59  R3  1.0
    X59  R23  1.0
    X59  OBJ  44.0
    X60  R3  1.0
    X60  R24  1.0
    X60  OBJ  4.0
    X61  R3  1.0
    X61  R25  1.0
    X61  OBJ  47.0
    X62  R3  1.0
    X62  R26  1.0
    X62  OBJ  37.0
    X63  R3  1.0
    X63  R27  1.0
    X63  OBJ  29.0
    X64  R3  1.0
    X64  R28  1.0
    X64  OBJ  49.0
    X65  R3  1.0
    X65  R29  1.0
    X65  OBJ  32.0
    X66  R3  1.0
    X66  R30  1.0
    X66  OBJ  32.0
    X67  R3  1.0
    X67  R31  1.0
    X67  OBJ  3.0
    X68  R3  1.0
    X68  R32  1.0
    X68  OBJ  6.0
    X69  R3  1.0
    X69  R33  1.0
    X69  OBJ  1.0
    X70  R3  1.0
    X70  R34  1.0
    X70  OBJ  4.0
    X71  R3  1.0
    X71  R35  1.0
    X71  OBJ  6.0
    X72  R4  1.0
    X72  R18  1.0
    X72  OBJ  49.0
    X73  R4  1.0
    X73  R19  1.0
    X73  OBJ  28.0
    X74  R4  1.0
    X74  R20  1.0
    X74  OBJ  48.0
    X75  R4  1.0
    X75  R21  1.0
    X75  OBJ  47.0
    X76  R4  1.0
    X76  R22  1.0
    X76  OBJ  40.0
    X77  R4  1.0
    X77  R23  1.0
    X77  OBJ  43.0
    X78  R4  1.0
    X78  R24  1.0
    X78  OBJ  21.0
    X79  R4  1.0
    X79  R25  1.0
    X79  OBJ  8.0
    X80  R4  1.0
    X80  R26  1.0
    X80  OBJ  47.0
    X81  R4  1.0
    X81  R27  1.0
    X81  OBJ  49.0
    X82  R4  1.0
    X82  R28  1.0
    X82  OBJ  6.0
    X83  R4  1.0
    X83  R29  1.0
    X83  OBJ  49.0
    X84  R4  1.0
    X84  R30  1.0
    X84  OBJ  47.0
    X85  R4  1.0
    X85  R31  1.0
    X85  OBJ  11.0
    X86  R4  1.0
    X86  R32  1.0
    X86  OBJ  25.0
    X87  R4  1.0
    X87  R33  1.0
    X87  OBJ  35.0
    X88  R4  1.0
    X88  R34  1.0
    X88  OBJ  3.0
    X89  R4  1.0
    X89  R35  1.0
    X89  OBJ  6.0
    X90  R5  1.0
    X90  R18  1.0
    X90  OBJ  45.0
    X91  R5  1.0
    X91  R19  1.0
    X91  OBJ  5.0
    X92  R5  1.0
    X92  R20  1.0
    X92  OBJ  47.0
    X93  R5  1.0
    X93  R21  1.0
    X93  OBJ  29.0
    X94  R5  1.0
    X94  R22  1.0
    X94  OBJ  44.0
    X95  R5  1.0
    X95  R23  1.0
    X95  OBJ  3.0
    X96  R5  1.0
    X96  R24  1.0
    X96  OBJ  36.0
    X97  R5  1.0
    X97  R25  1.0
    X97  OBJ  28.0
    X98  R5  1.0
    X98  R26  1.0
    X98  OBJ  14.0
    X99  R5  1.0
    X99  R27  1.0
    X99  OBJ  13.0
    X100  R5  1.0
    X100  R28  1.0
    X100  OBJ  17.0
    X101  R5  1.0
    X101  R29  1.0
    X101  OBJ  15.0
    X102  R5  1.0
    X102  R30  1.0
    X102  OBJ  47.0
    X103  R5  1.0
    X103  R31  1.0
    X103  OBJ  3.0
    X104  R5  1.0
    X104  R32  1.0
    X104  OBJ  18.0
    X105  R5  1.0
    X105  R33  1.0
    X105  OBJ  36.0
    X106  R5  1.0
    X106  R34  1.0
    X106  OBJ  7.0
    X107  R5  1.0
    X107  R35  1.0
    X107  OBJ  21.0
    X108  R6  1.0
    X108  R18  1.0
    X108  OBJ  21.0
    X109  R6  1.0
    X109  R19  1.0
    X109  OBJ  40.0
    X110  R6  1.0
    X110  R20  1.0
    X110  OBJ  43.0
    X111  R6  1.0
    X111  R21  1.0
    X111  OBJ  20.0
    X112  R6  1.0
    X112  R22  1.0
    X112  OBJ  39.0
    X113  R6  1.0
    X113  R23  1.0
    X113  OBJ  33.0
    X114  R6  1.0
    X114  R24  1.0
    X114  OBJ  42.0
    X115  R6  1.0
    X115  R25  1.0
    X115  OBJ  19.0
    X116  R6  1.0
    X116  R26  1.0
    X116  OBJ  34.0
    X117  R6  1.0
    X117  R27  1.0
    X117  OBJ  28.0
    X118  R6  1.0
    X118  R28  1.0
    X118  OBJ  48.0
    X119  R6  1.0
    X119  R29  1.0
    X119  OBJ  36.0
    X120  R6  1.0
    X120  R30  1.0
    X120  OBJ  12.0
    X121  R6  1.0
    X121  R31  1.0
    X121  OBJ  38.0
    X122  R6  1.0
    X122  R32  1.0
    X122  OBJ  22.0
    X123  R6  1.0
    X123  R33  1.0
    X123  OBJ  34.0
    X124  R6  1.0
    X124  R34  1.0
    X124  OBJ  14.0
    X125  R6  1.0
    X125  R35  1.0
    X125  OBJ  23.0
    X126  R7  1.0
    X126  R18  1.0
    X126  OBJ  41.0
    X127  R7  1.0
    X127  R19  1.0
    X127  OBJ  27.0
    X128  R7  1.0
    X128  R20  1.0
    X128  OBJ  8.0
    X129  R7  1.0
    X129  R21  1.0
    X129  OBJ  35.0
    X130  R7  1.0
    X130  R22  1.0
    X130  OBJ  47.0
    X131  R7  1.0
    X131  R23  1.0
    X131  OBJ  49.0
    X132  R7  1.0
    X132  R24  1.0
    X132  OBJ  16.0
    X133  R7  1.0
    X133  R25  1.0
    X133  OBJ  4.0
    X134  R7  1.0
    X134  R26  1.0
    X134  OBJ  44.0
    X135  R7  1.0
    X135  R27  1.0
    X135  OBJ  2.0
    X136  R7  1.0
    X136  R28  1.0
    X136  OBJ  47.0
    X137  R7  1.0
    X137  R29  1.0
    X137  OBJ  18.0
    X138  R7  1.0
    X138  R30  1.0
    X138  OBJ  44.0
    X139  R7  1.0
    X139  R31  1.0
    X139  OBJ  13.0
    X140  R7  1.0
    X140  R32  1.0
    X140  OBJ  46.0
    X141  R7  1.0
    X141  R33  1.0
    X141  OBJ  3.0
    X142  R7  1.0
    X142  R34  1.0
    X142  OBJ  37.0
    X143  R7  1.0
    X143  R35  1.0
    X143  OBJ  23.0
    X144  R8  1.0
    X144  R18  1.0
    X144  OBJ  1.0
    X145  R8  1.0
    X145  R19  1.0
    X145  OBJ  23.0
    X146  R8  1.0
    X146  R20  1.0
    X146  OBJ  31.0
    X147  R8  1.0
    X147  R21  1.0
    X147  OBJ  44.0
    X148  R8  1.0
    X148  R22  1.0
    X148  OBJ  33.0
    X149  R8  1.0
    X149  R23  1.0
    X149  OBJ  35.0
    X150  R8  1.0
    X150  R24  1.0
    X150  OBJ  47.0
    X151  R8  1.0
    X151  R25  1.0
    X151  OBJ  38.0
    X152  R8  1.0
    X152  R26  1.0
    X152  OBJ  29.0
    X153  R8  1.0
    X153  R27  1.0
    X153  OBJ  31.0
    X154  R8  1.0
    X154  R28  1.0
    X154  OBJ  2.0
    X155  R8  1.0
    X155  R29  1.0
    X155  OBJ  46.0
    X156  R8  1.0
    X156  R30  1.0
    X156  OBJ  20.0
    X157  R8  1.0
    X157  R31  1.0
    X157  OBJ  26.0
    X158  R8  1.0
    X158  R32  1.0
    X158  OBJ  9.0
    X159  R8  1.0
    X159  R33  1.0
    X159  OBJ  4.0
    X160  R8  1.0
    X160  R34  1.0
    X160  OBJ  17.0
    X161  R8  1.0
    X161  R35  1.0
    X161  OBJ  17.0
    X162  R9  1.0
    X162  R18  1.0
    X162  OBJ  25.0
    X163  R9  1.0
    X163  R19  1.0
    X163  OBJ  29.0
    X164  R9  1.0
    X164  R20  1.0
    X164  OBJ  39.0
    X165  R9  1.0
    X165  R21  1.0
    X165  OBJ  32.0
    X166  R9  1.0
    X166  R22  1.0
    X166  OBJ  44.0
    X167  R9  1.0
    X167  R23  1.0
    X167  OBJ  29.0
    X168  R9  1.0
    X168  R24  1.0
    X168  OBJ  37.0
    X169  R9  1.0
    X169  R25  1.0
    X169  OBJ  49.0
    X170  R9  1.0
    X170  R26  1.0
    X170  OBJ  10.0
    X171  R9  1.0
    X171  R27  1.0
    X171  OBJ  35.0
    X172  R9  1.0
    X172  R28  1.0
    X172  OBJ  20.0
    X173  R9  1.0
    X173  R29  1.0
    X173  OBJ  3.0
    X174  R9  1.0
    X174  R30  1.0
    X174  OBJ  43.0
    X175  R9  1.0
    X175  R31  1.0
    X175  OBJ  47.0
    X176  R9  1.0
    X176  R32  1.0
    X176  OBJ  41.0
    X177  R9  1.0
    X177  R33  1.0
    X177  OBJ  41.0
    X178  R9  1.0
    X178  R34  1.0
    X178  OBJ  1.0
    X179  R9  1.0
    X179  R35  1.0
    X179  OBJ  49.0
    X180  R10  1.0
    X180  R18  1.0
    X180  OBJ  41.0
    X181  R10  1.0
    X181  R19  1.0
    X181  OBJ  24.0
    X182  R10  1.0
    X182  R20  1.0
    X182  OBJ  45.0
    X183  R10  1.0
    X183  R21  1.0
    X183  OBJ  12.0
    X184  R10  1.0
    X184  R22  1.0
    X184  OBJ  10.0
    X185  R10  1.0
    X185  R23  1.0
    X185  OBJ  19.0
    X186  R10  1.0
    X186  R24  1.0
    X186  OBJ  4.0
    X187  R10  1.0
    X187  R25  1.0
    X187  OBJ  26.0
    X188  R10  1.0
    X188  R26  1.0
    X188  OBJ  23.0
    X189  R10  1.0
    X189  R27  1.0
    X189  OBJ  34.0
    X190  R10  1.0
    X190  R28  1.0
    X190  OBJ  32.0
    X191  R10  1.0
    X191  R29  1.0
    X191  OBJ  41.0
    X192  R10  1.0
    X192  R30  1.0
    X192  OBJ  8.0
    X193  R10  1.0
    X193  R31  1.0
    X193  OBJ  25.0
    X194  R10  1.0
    X194  R32  1.0
    X194  OBJ  42.0
    X195  R10  1.0
    X195  R33  1.0
    X195  OBJ  41.0
    X196  R10  1.0
    X196  R34  1.0
    X196  OBJ  49.0
    X197  R10  1.0
    X197  R35  1.0
    X197  OBJ  7.0
    X198  R11  1.0
    X198  R18  1.0
    X198  OBJ  30.0
    X199  R11  1.0
    X199  R19  1.0
    X199  OBJ  18.0
    X200  R11  1.0
    X200  R20  1.0
    X200  OBJ  20.0
    X201  R11  1.0
    X201  R21  1.0
    X201  OBJ  47.0
    X202  R11  1.0
    X202  R22  1.0
    X202  OBJ  37.0
    X203  R11  1.0
    X203  R23  1.0
    X203  OBJ  19.0
    X204  R11  1.0
    X204  R24  1.0
    X204  OBJ  28.0
    X205  R11  1.0
    X205  R25  1.0
    X205  OBJ  35.0
    X206  R11  1.0
    X206  R26  1.0
    X206  OBJ  13.0
    X207  R11  1.0
    X207  R27  1.0
    X207  OBJ  46.0
    X208  R11  1.0
    X208  R28  1.0
    X208  OBJ  35.0
    X209  R11  1.0
    X209  R29  1.0
    X209  OBJ  44.0
    X210  R11  1.0
    X210  R30  1.0
    X210  OBJ  15.0
    X211  R11  1.0
    X211  R31  1.0
    X211  OBJ  7.0
    X212  R11  1.0
    X212  R32  1.0
    X212  OBJ  42.0
    X213  R11  1.0
    X213  R33  1.0
    X213  OBJ  45.0
    X214  R11  1.0
    X214  R34  1.0
    X214  OBJ  46.0
    X215  R11  1.0
    X215  R35  1.0
    X215  OBJ  37.0
    X216  R12  1.0
    X216  R18  1.0
    X216  OBJ  1.0
    X217  R12  1.0
    X217  R19  1.0
    X217  OBJ  3.0
    X218  R12  1.0
    X218  R20  1.0
    X218  OBJ  44.0
    X219  R12  1.0
    X219  R21  1.0
    X219  OBJ  16.0
    X220  R12  1.0
    X220  R22  1.0
    X220  OBJ  26.0
    X221  R12  1.0
    X221  R23  1.0
    X221  OBJ  32.0
    X222  R12  1.0
    X222  R24  1.0
    X222  OBJ  15.0
    X223  R12  1.0
    X223  R25  1.0
    X223  OBJ  45.0
    X224  R12  1.0
    X224  R26  1.0
    X224  OBJ  39.0
    X225  R12  1.0
    X225  R27  1.0
    X225  OBJ  1.0
    X226  R12  1.0
    X226  R28  1.0
    X226  OBJ  43.0
    X227  R12  1.0
    X227  R29  1.0
    X227  OBJ  34.0
    X228  R12  1.0
    X228  R30  1.0
    X228  OBJ  4.0
    X229  R12  1.0
    X229  R31  1.0
    X229  OBJ  46.0
    X230  R12  1.0
    X230  R32  1.0
    X230  OBJ  39.0
    X231  R12  1.0
    X231  R33  1.0
    X231  OBJ  16.0
    X232  R12  1.0
    X232  R34  1.0
    X232  OBJ  26.0
    X233  R12  1.0
    X233  R35  1.0
    X233  OBJ  43.0
    X234  R13  1.0
    X234  R18  1.0
    X234  OBJ  1.0
    X235  R13  1.0
    X235  R19  1.0
    X235  OBJ  27.0
    X236  R13  1.0
    X236  R20  1.0
    X236  OBJ  16.0
    X237  R13  1.0
    X237  R21  1.0
    X237  OBJ  41.0
    X238  R13  1.0
    X238  R22  1.0
    X238  OBJ  7.0
    X239  R13  1.0
    X239  R23  1.0
    X239  OBJ  20.0
    X240  R13  1.0
    X240  R24  1.0
    X240  OBJ  3.0
    X241  R13  1.0
    X241  R25  1.0
    X241  OBJ  6.0
    X242  R13  1.0
    X242  R26  1.0
    X242  OBJ  36.0
    X243  R13  1.0
    X243  R27  1.0
    X243  OBJ  5.0
    X244  R13  1.0
    X244  R28  1.0
    X244  OBJ  40.0
    X245  R13  1.0
    X245  R29  1.0
    X245  OBJ  10.0
    X246  R13  1.0
    X246  R30  1.0
    X246  OBJ  31.0
    X247  R13  1.0
    X247  R31  1.0
    X247  OBJ  49.0
    X248  R13  1.0
    X248  R32  1.0
    X248  OBJ  10.0
    X249  R13  1.0
    X249  R33  1.0
    X249  OBJ  4.0
    X250  R13  1.0
    X250  R34  1.0
    X250  OBJ  26.0
    X251  R13  1.0
    X251  R35  1.0
    X251  OBJ  19.0
    X252  R14  1.0
    X252  R18  1.0
    X252  OBJ  34.0
    X253  R14  1.0
    X253  R19  1.0
    X253  OBJ  47.0
    X254  R14  1.0
    X254  R20  1.0
    X254  OBJ  12.0
    X255  R14  1.0
    X255  R21  1.0
    X255  OBJ  2.0
    X256  R14  1.0
    X256  R22  1.0
    X256  OBJ  29.0
    X257  R14  1.0
    X257  R23  1.0
    X257  OBJ  46.0
    X258  R14  1.0
    X258  R24  1.0
    X258  OBJ  39.0
    X259  R14  1.0
    X259  R25  1.0
    X259  OBJ  34.0
    X260  R14  1.0
    X260  R26  1.0
    X260  OBJ  21.0
    X261  R14  1.0
    X261  R27  1.0
    X261  OBJ  45.0
    X262  R14  1.0
    X262  R28  1.0
    X262  OBJ  40.0
    X263  R14  1.0
    X263  R29  1.0
    X263  OBJ  34.0
    X264  R14  1.0
    X264  R30  1.0
    X264  OBJ  30.0
    X265  R14  1.0
    X265  R31  1.0
    X265  OBJ  5.0
    X266  R14  1.0
    X266  R32  1.0
    X266  OBJ  23.0
    X267  R14  1.0
    X267  R33  1.0
    X267  OBJ  40.0
    X268  R14  1.0
    X268  R34  1.0
    X268  OBJ  38.0
    X269  R14  1.0
    X269  R35  1.0
    X269  OBJ  38.0
    X270  R15  1.0
    X270  R18  1.0
    X270  OBJ  23.0
    X271  R15  1.0
    X271  R19  1.0
    X271  OBJ  43.0
    X272  R15  1.0
    X272  R20  1.0
    X272  OBJ  25.0
    X273  R15  1.0
    X273  R21  1.0
    X273  OBJ  11.0
    X274  R15  1.0
    X274  R22  1.0
    X274  OBJ  31.0
    X275  R15  1.0
    X275  R23  1.0
    X275  OBJ  48.0
    X276  R15  1.0
    X276  R24  1.0
    X276  OBJ  1.0
    X277  R15  1.0
    X277  R25  1.0
    X277  OBJ  32.0
    X278  R15  1.0
    X278  R26  1.0
    X278  OBJ  25.0
    X279  R15  1.0
    X279  R27  1.0
    X279  OBJ  19.0
    X280  R15  1.0
    X280  R28  1.0
    X280  OBJ  36.0
    X281  R15  1.0
    X281  R29  1.0
    X281  OBJ  38.0
    X282  R15  1.0
    X282  R30  1.0
    X282  OBJ  41.0
    X283  R15  1.0
    X283  R31  1.0
    X283  OBJ  21.0
    X284  R15  1.0
    X284  R32  1.0
    X284  OBJ  16.0
    X285  R15  1.0
    X285  R33  1.0
    X285  OBJ  43.0
    X286  R15  1.0
    X286  R34  1.0
    X286  OBJ  43.0
    X287  R15  1.0
    X287  R35  1.0
    X287  OBJ  44.0
    X288  R16  1.0
    X288  R18  1.0
    X288  OBJ  26.0
    X289  R16  1.0
    X289  R19  1.0
    X289  OBJ  32.0
    X290  R16  1.0
    X290  R20  1.0
    X290  OBJ  10.0
    X291  R16  1.0
    X291  R21  1.0
    X291  OBJ  46.0
    X292  R16  1.0
    X292  R22  1.0
    X292  OBJ  1.0
    X293  R16  1.0
    X293  R23  1.0
    X293  OBJ  32.0
    X294  R16  1.0
    X294  R24  1.0
    X294  OBJ  4.0
    X295  R16  1.0
    X295  R25  1.0
    X295  OBJ  14.0
    X296  R16  1.0
    X296  R26  1.0
    X296  OBJ  37.0
    X297  R16  1.0
    X297  R27  1.0
    X297  OBJ  36.0
    X298  R16  1.0
    X298  R28  1.0
    X298  OBJ  43.0
    X299  R16  1.0
    X299  R29  1.0
    X299  OBJ  24.0
    X300  R16  1.0
    X300  R30  1.0
    X300  OBJ  19.0
    X301  R16  1.0
    X301  R31  1.0
    X301  OBJ  29.0
    X302  R16  1.0
    X302  R32  1.0
    X302  OBJ  13.0
    X303  R16  1.0
    X303  R33  1.0
    X303  OBJ  24.0
    X304  R16  1.0
    X304  R34  1.0
    X304  OBJ  11.0
    X305  R16  1.0
    X305  R35  1.0
    X305  OBJ  17.0
    X306  R17  1.0
    X306  R18  1.0
    X306  OBJ  26.0
    X307  R17  1.0
    X307  R19  1.0
    X307  OBJ  8.0
    X308  R17  1.0
    X308  R20  1.0
    X308  OBJ  3.0
    X309  R17  1.0
    X309  R21  1.0
    X309  OBJ  37.0
    X310  R17  1.0
    X310  R22  1.0
    X310  OBJ  24.0
    X311  R17  1.0
    X311  R23  1.0
    X311  OBJ  18.0
    X312  R17  1.0
    X312  R24  1.0
    X312  OBJ  8.0
    X313  R17  1.0
    X313  R25  1.0
    X313  OBJ  30.0
    X314  R17  1.0
    X314  R26  1.0
    X314  OBJ  9.0
    X315  R17  1.0
    X315  R27  1.0
    X315  OBJ  27.0
    X316  R17  1.0
    X316  R28  1.0
    X316  OBJ  45.0
    X317  R17  1.0
    X317  R29  1.0
    X317  OBJ  36.0
    X318  R17  1.0
    X318  R30  1.0
    X318  OBJ  44.0
    X319  R17  1.0
    X319  R31  1.0
    X319  OBJ  46.0
    X320  R17  1.0
    X320  R32  1.0
    X320  OBJ  45.0
    X321  R17  1.0
    X321  R33  1.0
    X321  OBJ  22.0
    X322  R17  1.0
    X322  R34  1.0
    X322  OBJ  43.0
    X323  R17  1.0
    X323  R35  1.0
    X323  OBJ  42.0
RHS
    RHS  R0  1.0
    RHS  R1  1.0
    RHS  R2  1.0
    RHS  R3  1.0
    RHS  R4  1.0
    RHS  R5  1.0
    RHS  R6  1.0
    RHS  R7  1.0
    RHS  R8  1.0
    RHS  R9  1.0
    RHS  R10  1.0
    RHS  R11  1.0
    RHS  R12  1.0
    RHS  R13  1.0
    RHS  R14  1.0
    RHS  R15  1.0
    RHS  R16  1.0
    RHS  R17  1.0
    RHS  R18  1.0
    RHS  R19  1.0
    RHS  R20  1.0
    RHS  R21  1.0
    RHS  R22  1.0
    RHS  R23  1.0
    RHS  R24  1.0
    RHS  R25  1.0
    RHS  R26  1.0
    RHS  R27  1.0
    RHS  R28  1.0
    RHS  R29  1.0
    RHS  R30  1.0
    RHS  R31  1.0
    RHS  R32  1.0
    RHS  R33  1.0
    RHS  R34  1.0
    RHS  R35  1.0
BOUNDS
 UP BND  X0  1.0
 UP BND  X1  1.0
 UP BND  X2  1.0
 UP BND  X3  1.0
 UP BND  X4  1.0
 UP BND  X5  1.0
 UP BND  X6  1.0
 UP BND  X7  1.0
 UP BND  X8  1.0
 UP BND  X9  1.0
 UP BND  X10  1.0
 UP BND  X11  1.0
 UP BND  X12  1.0
 UP BND  X13  1.0
 UP BND  X14  1.0
 UP BND  X15  1.0
 UP BND  X16  1.0
 UP BND  X17  1.0
 UP BND  X18  1.0
 UP BND  X19  1.0
 UP BND  X20  1.0
 UP BND  X21  1.0
 UP BND  X22  1.0
 UP BND  X23  1.0
 UP BND  X24  1.0
 UP BND  X25  1.0
 UP BND  X26  1.0
 UP BND  X27  1.0
 UP BND  X28  1.0
 UP BND  X29  1.0
 UP BND  X30  1.0
 UP BND  X31  1.0
 UP BND  X32  1.0
 UP BND  X33  1.0
 UP BND  X34  1.0
 UP BND  X35  1.0
 UP BND  X36  1.0
 UP BND  X37  1.0
 UP BND  X38  1.0
 UP BND  X39  1.0
 UP BND  X40  1.0
 UP BND  X41  1.0
 UP BND  X42  1.0
 UP BND  X43  1.0
 UP BND  X44  1.0
 UP BND  X45  1.0
 UP BND  X46  1.0
 UP BND  X47  1.0
 UP BND  X48  1.0
 UP BND  X49  1.0
 UP BND  X50  1.0
 UP BND  X51  1.0
 UP BND  X52  1.0
 UP BND  X53  1.0
 UP BND  X54  1.0
 UP BND  X55  1.0
 UP BND  X56  1.0
 UP BND  X57  1.0
 UP BND  X58  1.0
 UP BND  X59  1.0
 UP BND  X60  1.0
 UP BND  X61  1.0
 UP BND  X62  1.0
 UP BND  X63  1.0
 UP BND  X64  1.0
 UP BND  X65  1.0
 UP BND  X66  1.0
 UP BND  X67  1.0
 UP BND  X68  1.0
 UP BND  X69  1.0
 UP BND  X70  1.0
 UP BND  X71  1.0
 UP BND  X72  1.0
 UP BND  X73  1.0
 UP BND  X74  1.0
 UP BND  X75  1.0
 UP BND  X76  1.0
 UP BND  X77  1.0
 UP BND  X78  1.0
 UP BND  X79  1.0
 UP BND  X80  1.0
 UP BND  X81  1.0
 UP BND  X82  1.0
 UP BND  X83  1.0
 UP BND  X84  1.0
 UP BND  X85  1.0
 UP BND  X86  1.0
 UP BND  X87  1.0
 UP BND  X88  1.0
 UP BND  X89  1.0
 UP BND  X90  1.0
 UP BND  X91  1.0
 UP BND  X92  1.0
 UP BND  X93  1.0
 UP BND  X94  1.0
 UP BND  X95  1.0
 UP BND  X96  1.0
 UP BND  X97  1.0
 UP BND  X98  1.0
 UP BND  X99  1.0
 UP BND  X100  1.0
 UP BND  X101  1.0
 UP BND  X102  1.0
 UP BND  X103  1.0
 UP BND  X104  1.0
 UP BND  X105  1.0
 UP BND  X106  1.0
 UP BND  X107  1.0
 UP BND  X108  1.0
 UP BND  X109  1.0
 UP BND  X110  1.0
 UP BND  X111  1.0
 UP BND  X112  1.0
 UP BND  X113  1.0
 UP BND  X114  1.0
 UP BND  X115  1.0
 UP BND  X116  1.0
 UP BND  X117  1.0
 UP BND  X118  1.0
 UP BND  X119  1.0
 UP BND  X120  1.0
 UP BND  X121  1.0
 UP BND  X122  1.0
 UP BND  X123  1.0
 UP BND  X124  1.0
 UP BND  X125  1.0
 UP BND  X126  1.0
 UP BND  X127  1.0
 UP BND  X128  1.0
 UP BND  X129  1.0
 UP BND  X130  1.0
 UP BND  X131  1.0
 UP BND  X132  1.0
 UP BND  X133  1.0
 UP BND  X134  1.0
 UP BND  X135  1.0
 UP BND  X136  1.0
 UP BND  X137  1.0
 UP BND  X138  1.0
 UP BND  X139  1.0
 UP BND  X140  1.0
 UP BND  X141  1.0
 UP BND  X142  1.0
 UP BND  X143  1.0
 UP BND  X144  1.0
 UP BND  X145  1.0
 UP BND  X146  1.0
 UP BND  X147  1.0
 UP BND  X148  1.0
 UP BND  X149  1.0
 UP BND  X150  1.0
 UP BND  X151  1.0
 UP BND  X152  1.0
 UP BND  X153  1.0
 UP BND  X154  1.0
 UP BND  X155  1.0
 UP BND  X156  1.0
 UP BND  X157  1.0
 UP BND  X158  1.0
 UP BND  X159  1.0
 UP BND  X160  1.0
 UP BND  X161  1.0
 UP BND  X162  1.0
 UP BND  X163  1.0
 UP BND  X164  1.0
 UP BND  X165  1.0
 UP BND  X166  1.0
 UP BND  X167  1.0
 UP BND  X168  1.0
 UP BND  X169  1.0
 UP BND  X170  1.0
 UP BND  X171  1.0
 UP BND  X172  1.0
 UP BND  X173  1.0
 UP BND  X174  1.0
 UP BND  X175  1.0
 UP BND  X176  1.0
 UP BND  X177  1.0
 UP BND  X178  1.0
 UP BND  X179  1.0
 UP BND  X180  1.0
 UP BND  X181  1.0
 UP BND  X182  1.0
 UP BND  X183  1.0
 UP BND  X184  1.0
 UP BND  X185  1.0
 UP BND  X186  1.0
 UP BND  X187  1.0
 UP BND  X188  1.0
 UP BND  X189  1.0
 UP BND  X190  1.0
 UP BND  X191  1.0
 UP BND  X192  1.0
 UP BND  X193  1.0
 UP BND  X194  1.0
 UP BND  X195  1.0
 UP BND  X196  1.0
 UP BND  X197  1.0
 UP BND  X198  1.0
 UP BND  X199  1.0
 UP BND  X200  1.0
 UP BND  X201  1.0
 UP BND  X202  1.0
 UP BND  X203  1.0
 UP BND  X204  1.0
 UP BND  X205  1.0
 UP BND  X206  1.0
 UP BND  X207  1.0
 UP BND  X208  1.0
 UP BND  X209  1.0
 UP BND  X210  1.0
 UP BND  X211  1.0
 UP BND  X212  1.0
 UP BND  X213  1.0
 UP BND  X214  1.0
 UP BND  X215  1.0
 UP BND  X216  1.0
 UP BND  X217  1.0
 UP BND  X218  1.0
 UP BND  X219  1.0
 UP BND  X220  1.0
 UP BND  X221  1.0
 UP BND  X222  1.0
 UP BND  X223  1.0
 UP BND  X224  1.0
 UP BND  X225  1.0
 UP BND  X226  1.0
 UP BND  X227  1.0
 UP BND  X228  1.0
 UP BND  X229  1.0
 UP BND  X230  1.0
 UP BND  X231  1.0
 UP BND  X232  1.0
 UP BND  X233  1.0
 UP BND  X234  1.0
 UP BND  X235  1.0
 UP BND  X236  1.0
 UP BND  X237  1.0
 UP BND  X238  1.0
 UP BND  X239  1.0
 UP BND  X240  1.0
 UP BND  X241  1.0
 UP BND  X242  1.0
 UP BND  X243  1.0
 UP BND  X244  1.0
 UP BND  X245  1.0
 UP BND  X246  1.0
 UP BND  X247  1.0
 UP BND  X248  1.0
 UP BND  X249  1.0
 UP BND  X250  1.0
 UP BND  X251  1.0
 UP BND  X252  1.0
 UP BND  X253  1.0
 UP BND  X254  1.0
 UP BND  X255  1.0
 UP BND  X256  1.0
 UP BND  X257  1.0
 UP BND  X258  1.0
 UP BND  X259  1.0
 UP BND  X260  1.0
 UP BND  X261  1.0
 UP BND  X262  1.0
 UP BND  X263  1.0
 UP BND  X264  1.0
 UP BND  X265  1.0
 UP BND  X266  1.0
 UP BND  X267  1.0
 UP BND  X268  1.0
 UP BND  X269  1.0
 UP BND  X270  1.0
 UP BND  X271  1.0
 UP BND  X272  1.0
 UP BND  X273  1.0
 UP BND  X274  1.0
 UP BND  X275  1.0
 UP BND  X276  1.0
 UP BND  X277  1.0
 UP BND  X278  1.0
 UP BND  X279  1.0
 UP BND  X280  1.0
 UP BND  X281  1.0
 UP BND  X282  1.0
 UP BND  X283  1.0
 UP BND  X284  1.0
 UP BND  X285  1.0
 UP BND  X286  1.0
 UP BND  X287  1.0
 UP BND  X288  1.0
 UP BND  X289  1.0
 UP BND  X290  1.0
 UP BND  X291  1.0
 UP BND  X292  1.0
 UP BND  X293  1.0
 UP BND  X294  1.0
 UP BND  X295  1.0
 UP BND  X296  1.0
 UP BND  X297  1.0
 UP BND  X298  1.0
 UP BND  X299  1.0
 UP BND  X300  1.0
 UP BND  X301  1.0
 UP BND  X302  1.0
 UP BND  X303  1.0
 UP BND  X304  1.0
 UP BND  X305  1.0
 UP BND  X306  1.0
 UP BND  X307  1.0
 UP BND  X308  1.0
 UP BND  X309  1.0
 UP BND  X310  1.0
 UP BND  X311  1.0
 UP BND  X312  1.0
 UP BND  X313  1.0
 UP BND  X314  1.0
 UP BND  X315  1.0
 UP BND  X316  1.0
 UP BND  X317  1.0
 UP BND  X318  1.0
 UP BND  X319  1.0
 UP BND  X320  1.0
 UP BND  X321  1.0
 UP BND  X322  1.0
 UP BND  X323  1.0
ENDATA
